"""Ctrl-C handling (src/ctrlc.c analogue) and console reporting
(src/util.c:42-236 columns) — the remaining observability behaviors."""

import numpy as np
from osqp_tpu import constants as con
from osqp_tpu.solver import Solver
import osqp_tpu.solver as solver_mod


def _problem():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, 0.0, 0.0])
    u = np.array([1.0, 0.7, 0.7])
    return P, q, A, l, u


def test_sigint_between_segments(monkeypatch):
    """A KeyboardInterrupt during the segmented solve yields the
    reference's OSQP_SIGINT status (osqp.c:377-385): 'interrupted by
    user', no further checks, solver still usable."""
    P, q, A, l, u = _problem()
    # unreachable tolerance => many segments, so the interrupt lands
    # mid-solve (a converged problem would exit in segment one)
    s = Solver(
        P, q, A, l, u, verbose=False, time_limit=1e6, max_iter=4000,
        eps_abs=0.0, eps_rel=1e-18,
    )

    real_segment = solver_mod._device_segment
    calls = {"n": 0}

    def interrupting_segment(*args, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise KeyboardInterrupt
        return real_segment(*args, **kw)

    monkeypatch.setattr(solver_mod, "_device_segment", interrupting_segment)
    res = s.solve()
    assert res.info.status_val == con.OSQP_SIGINT
    assert res.info.status == "interrupted"  # auxil.c:675

    # Workspace remains usable: a clean re-solve succeeds
    monkeypatch.setattr(solver_mod, "_device_segment", real_segment)
    s.update_eps_abs(1e-3)
    s.update_eps_rel(1e-3)
    res2 = s.solve()
    assert res2.info.status_val == con.OSQP_SOLVED


def test_sigint_default_settings(monkeypatch):
    """Ctrl-C works on a *default-settings* solve (no time_limit, no
    verbose): every solve goes through the segmented path (round-2
    change; reference polls SIGINT every iteration, osqp.c:374-385)."""
    P, q, A, l, u = _problem()
    s = Solver(P, q, A, l, u, eps_abs=0.0, eps_rel=1e-18, max_iter=4000)

    def interrupting_segment(*args, **kw):
        raise KeyboardInterrupt

    monkeypatch.setattr(solver_mod, "_device_segment", interrupting_segment)
    res = s.solve()
    assert res.info.status_val == con.OSQP_SIGINT


def test_sigint_solve_batch(monkeypatch):
    """On the batched polling path (any time limit set), a
    KeyboardInterrupt between segments finalizes still-active instances
    with OSQP_SIGINT.  (With NO time limit the batched driver fuses the
    whole range into one device program for throughput — Ctrl-C then
    propagates as KeyboardInterrupt like solve_batch_jit; see
    test_segmented.test_batch_happy_path_single_dispatch.)"""
    import osqp_tpu.batch as batch_mod

    P, q, A, l, u = _problem()
    Pb, qb = P[None], q[None]
    Ab, lb, ub = A[None], l[None], u[None]

    real_segment = batch_mod._segment_c
    calls = {"n": 0}

    def interrupting_segment(*args, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise KeyboardInterrupt
        return real_segment(*args, **kw)

    monkeypatch.setattr(batch_mod, "_segment_c", interrupting_segment)
    res = batch_mod.solve_batch(
        Pb, qb, Ab, lb, ub, eps_abs=0.0, eps_rel=1e-18, max_iter=100000,
        verbose=False, time_limit=1e6,
    )
    assert int(res.status_val[0]) == con.OSQP_SIGINT


def test_time_limit_solve_batch():
    """settings.time_limit is honored on the batched path
    (osqp.c:387-407 analogue)."""
    P, q, A, l, u = _problem()
    res = __import__("osqp_tpu.batch", fromlist=["solve_batch"]).solve_batch(
        P[None], q[None], A[None], l[None], u[None],
        eps_abs=0.0, eps_rel=1e-18, max_iter=1000000, time_limit=1e-9,
        check_termination=0, verbose=False,
    )
    assert int(res.status_val[0]) == con.OSQP_TIME_LIMIT_REACHED


def test_time_limit_status():
    """Time limit with *unreachable* tolerances stays TIME_LIMIT_REACHED.
    (With reachable tolerances the reference also flips to solved after
    the break — osqp.c:575-590 runs the final checks — so the status is
    only TIME_LIMIT when the final plain+approximate checks fail.)"""
    P, q, A, l, u = _problem()
    s = Solver(
        P, q, A, l, u, verbose=False, time_limit=1e-9,
        check_termination=0, max_iter=100000,
        eps_abs=0.0, eps_rel=1e-18,
    )
    res = s.solve()
    assert res.info.status_val == con.OSQP_TIME_LIMIT_REACHED
    assert res.info.status == "run time limit reached"


def test_verbose_output_columns(capsys):
    """Header/rows/footer carry the reference's columns
    (print_setup_header / print_summary / print_footer)."""
    P, q, A, l, u = _problem()
    s = Solver(P, q, A, l, u, verbose=True, polish=True)
    res = s.solve()
    out = capsys.readouterr().out
    assert "Operator Splitting QP Solver" in out
    assert "variables n = 2, constraints m = 3" in out
    assert "iter " in out and "objective" in out and "pri res" in out
    assert "status:" in out and "solved" in out
    assert "number of iterations:" in out
    assert "optimal rho estimate" in out
    assert res.info.status_val == con.OSQP_SOLVED


def test_verbose_solve_batch(capsys):
    """The functional batched entry prints the same header/rows/footer
    (util.c:42-236) — instance-0 rows plus a batch status histogram."""
    from osqp_tpu.batch import solve_batch

    P, q, A, l, u = _problem()
    B = 3
    bc = lambda v: np.broadcast_to(v, (B,) + v.shape).copy()
    res = solve_batch(bc(P), bc(q), bc(A), bc(l), bc(u), verbose=True)
    out = capsys.readouterr().out
    assert "Operator Splitting QP Solver" in out
    assert "variables n = 2, constraints m = 3 (x 3 instances)" in out
    assert "iter " in out and "objective" in out and "pri res" in out
    assert "batch status:         solved: 3" in out
    assert "optimal rho estimate" in out
    assert np.all(np.asarray(res.status_val) == con.OSQP_SOLVED)

    # verbose=False must print nothing (and stay on the fused path)
    res = solve_batch(bc(P), bc(q), bc(A), bc(l), bc(u), verbose=False)
    assert capsys.readouterr().out == ""
    assert np.all(np.asarray(res.status_val) == con.OSQP_SOLVED)


def test_verbose_solve_sparse(capsys):
    """solve_sparse prints reference-format rows (the round-2 review
    flagged the sparse path as header/footer only)."""
    import scipy.sparse as sp

    from osqp_tpu.large import solve_sparse

    P, q, A, l, u = _problem()
    res = solve_sparse(sp.csc_matrix(P), q, sp.csc_matrix(A), l, u,
                       verbose=True, polish=True)
    out = capsys.readouterr().out
    assert "Operator Splitting QP Solver" in out
    assert "linear system solver = cg" in out
    assert "iter " in out and "objective" in out and "dua res" in out
    assert "status:               solved" in out
    assert int(np.asarray(res.status_val)[0]) == con.OSQP_SOLVED
