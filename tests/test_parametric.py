"""BatchedSolver parametric workflow == per-instance Solver workflow.

Runs the same multi-step update/re-solve sequence through the batched
device-resident API and through B independent single-problem Solvers and
requires identical trajectories (statuses, solutions, iteration counts)."""

import numpy as np
import pytest

import osqp_tpu
from osqp_tpu import constants as con
from osqp_tpu.parametric import BatchedSolver

from conftest import assert_allclose
from test_batch import random_qps


def test_parametric_loop_matches_single_solvers():
    B, n, m = 4, 6, 9
    P, q, A, l, u = random_qps(B, n, m, seed=23)
    rng = np.random.default_rng(42)

    bs = BatchedSolver(P, q, A, l, u, verbose=False)
    singles = [
        osqp_tpu.Solver(P=P[i], q=q[i], A=A[i], l=l[i], u=u[i], verbose=False)
        for i in range(B)
    ]

    for step in range(3):
        rb = bs.solve()
        rs = [s.solve() for s in singles]
        for i in range(B):
            assert int(np.asarray(rb.status_val)[i]) == con.OSQP_SOLVED
            assert rs[i].info.status_val == con.OSQP_SOLVED
            assert int(np.asarray(rb.iter)[i]) == rs[i].info.iter, (step, i)
            assert_allclose(np.asarray(rb.x)[i], rs[i].x, tol=1e-9)

        # parametric perturbations for the next step
        q = q + 0.1 * rng.standard_normal((B, n))
        shift = 0.05 * rng.standard_normal((B, m))
        l = l + shift
        u = u + shift
        bs.update_lin_cost(q)
        bs.update_bounds(l, u)
        for i in range(B):
            singles[i].update_lin_cost(q[i])
            singles[i].update_bounds(l=l[i], u=u[i])


def test_parametric_update_rho_and_warm_start():
    B, n, m = 3, 5, 7
    P, q, A, l, u = random_qps(B, n, m, seed=29)
    bs = BatchedSolver(
        P, q, A, l, u, verbose=False, adaptive_rho=False, check_termination=1
    )
    r1 = bs.solve()
    # warm start at optimum -> 1 iteration (test_basic_qp.h:893 analogue)
    bs.warm_start(x=np.asarray(r1.x), y=np.asarray(r1.y))
    r2 = bs.solve()
    assert np.all(np.asarray(r2.iter) == 1)

    bs.update_rho(0.5)
    r3 = bs.solve()
    assert np.all(np.asarray(r3.status_val) == con.OSQP_SOLVED)


def test_parametric_update_P_A():
    B, n, m = 3, 5, 7
    P, q, A, l, u = random_qps(B, n, m, seed=31)
    kw = dict(verbose=False, polish=True, eps_abs=1e-7, eps_rel=1e-7)
    bs = BatchedSolver(P, q, A, l, u, **kw)
    bs.solve()

    P2 = P * 1.5
    A2 = A + 0.01
    bs.update_P_A(P2, A2)
    rb = bs.solve()  # warm-started from the pre-update solution
    for i in range(B):
        s = osqp_tpu.Solver(P=P2[i], q=q[i], A=A2[i], l=l[i], u=u[i], **kw)
        ri = s.solve()
        assert_allclose(np.asarray(rb.x)[i], ri.x, tol=1e-6)


@pytest.mark.nanok  # the equality-flip leg can turn an instance
# primal-infeasible -> NaN-filled store_solution (by design)
def test_fused_resolve_matches_update_then_solve():
    """resolve(q, l, u) (one fused device program, parametric._resolve_jit)
    must be bit-identical to update_lin_cost + update_bounds + solve()."""
    P, q, A, l, u = random_qps(4, 16, 24, seed=3)
    a = BatchedSolver(P, q, A, l, u, verbose=False)
    b = BatchedSolver(P, q, A, l, u, verbose=False)
    a.solve()
    b.solve()
    qn = q * 1.25
    ln, un = l * 0.9, u * 0.9
    a.update_lin_cost(qn)
    a.update_bounds(ln, un)
    ra = a.solve()
    rb = b.resolve(q=qn, l=ln, u=un)
    assert np.array_equal(np.asarray(ra.iter), np.asarray(rb.iter))
    assert np.array_equal(np.asarray(ra.status_val), np.asarray(rb.status_val))
    np.testing.assert_array_equal(np.asarray(ra.x), np.asarray(rb.x))
    # q-only variant (no refactor branch in the program)
    ra2 = None
    a.update_lin_cost(q * 0.5)
    ra2 = a.solve()
    rb2 = b.resolve(q=q * 0.5)
    assert np.array_equal(np.asarray(ra2.iter), np.asarray(rb2.iter))
    np.testing.assert_array_equal(np.asarray(ra2.x), np.asarray(rb2.x))
    # bounds change that flips constraint classes (forces the fused
    # refactor path): make two rows equalities
    l3, u3 = l.copy(), u.copy()
    l3[:, 0] = u3[:, 0] = 0.1
    a.update_bounds(l3, u3)
    ra3 = a.solve()
    rb3 = b.resolve(l=l3, u=u3)
    assert np.array_equal(np.asarray(ra3.iter), np.asarray(rb3.iter))
    np.testing.assert_array_equal(np.asarray(ra3.x), np.asarray(rb3.x))
