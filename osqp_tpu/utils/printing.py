"""Console reporting with the reference's columns (src/util.c:42-236)."""

from __future__ import annotations

from .. import __version__ as _ver
from .. import constants as con


def print_setup_header(solver) -> None:
    """print_setup_header (util.c:58-150)."""
    print_setup_header_vals(
        solver.settings, solver.n, solver.m,
        solver._Pu.nnz + solver._Ac.nnz,
    )


def print_setup_header_vals(s, n, m, nnz, B: int = 1) -> None:
    """Data-driven setup header (util.c:58-150) — shared by the
    stateful Solver and the functional solve_batch / solve_sparse
    entries, which have no solver object."""
    print("-" * 59)
    print(
        f"           OSQP-TPU v{_ver}  -  Operator Splitting QP Solver\n"
        "              (TPU-native re-implementation of OSQP)"
    )
    print("-" * 59)
    batch = f" (x {B} instances)" if B > 1 else ""
    print("problem:  variables n = %d, constraints m = %d%s"
          % (n, m, batch))
    print("          nnz(P) + nnz(A) = %d" % nnz)
    print(
        "settings: linear system solver = %s (backend)" % s.linsys_solver,
    )
    print(
        f"          eps_abs = {s.eps_abs:.1e}, eps_rel = {s.eps_rel:.1e},\n"
        f"          eps_prim_inf = {s.eps_prim_inf:.1e}, "
        f"eps_dual_inf = {s.eps_dual_inf:.1e},\n"
        f"          rho = {s.rho:.2e} "
        + ("(adaptive)" if s.adaptive_rho else "")
        + f",\n          sigma = {s.sigma:.2e}, alpha = {s.alpha:.2f}, "
        f"max_iter = {s.max_iter}"
    )
    if s.check_termination:
        print(f"          check_termination: on (interval {s.check_termination})")
    else:
        print("          check_termination: off")
    print(f"          scaling: {'on' if s.scaling else 'off'}, "
          f"scaled_termination: {'on' if s.scaled_termination else 'off'}")
    print(f"          warm start: {'on' if s.warm_start else 'off'}, "
          f"polish: {'on' if s.polish else 'off'}, "
          f"time_limit: {s.time_limit if s.time_limit else 'off'}")
    print()


def print_iter_row(k, obj, pri, dua, rho, t) -> None:
    """print_summary (util.c:152-175)."""
    print(f"{k:4d}  {obj: .4e}  {pri:.2e}  {dua:.2e}  {rho:.2e}  {t:.2e}s")


def print_iter_header() -> None:
    """print_header (util.c:42-56)."""
    print("iter   objective    pri res    dua res    rho        time")


def print_summary_footer(solver) -> None:
    """print_polish + print_footer (util.c:177-236); per-iteration rows
    are printed live by the segmented solve loop."""
    info = solver.info
    if solver.settings.polish and info.status_polish == 1:
        print(
            f"plsh  {info.obj_val: .4e}  {info.pri_res:.2e}  "
            f"{info.dua_res:.2e}   --------   {info.polish_time:.2e}s"
        )
    print()
    print(f"status:               {info.status}")
    if solver.settings.polish:
        if info.status_polish == 1:
            print("solution polish:      successful")
        elif info.status_polish < 0:
            print("solution polish:      unsuccessful")
    print(f"number of iterations: {info.iter}")
    if info.status_val in (con.OSQP_SOLVED, con.OSQP_SOLVED_INACCURATE):
        print(f"optimal objective:    {info.obj_val:.4f}")
    print(f"run time:             {info.run_time:.2e}s")
    print(f"optimal rho estimate: {info.rho_estimate:.2e}")
    print()


def print_batch_footer(res, settings, run_time: float) -> None:
    """Footer for the functional solve_batch / solve_sparse results
    (util.c:177-236).  With B > 1 the per-solution lines report
    instance 0 (the reference is single-instance; rows/footers follow
    it) plus a batch status histogram so no instance is hidden."""
    import numpy as np

    status = np.asarray(res.status_val)
    B = status.shape[0]
    i0 = int(np.asarray(res.iter)[0])
    pol = int(np.asarray(res.status_polish)[0])
    if settings.polish and pol == 1:
        print(
            f"plsh  {float(np.asarray(res.obj_val)[0]): .4e}  "
            f"{float(np.asarray(res.pri_res)[0]):.2e}  "
            f"{float(np.asarray(res.dua_res)[0]):.2e}   --------   "
            "--------"
        )
    print()
    print(f"status:               "
          f"{con.STATUS_MESSAGE.get(int(status[0]), str(status[0]))}")
    if B > 1:
        vals, counts = np.unique(status, return_counts=True)
        hist = ", ".join(
            f"{con.STATUS_MESSAGE.get(int(v), str(v))}: {c}"
            for v, c in zip(vals, counts)
        )
        print(f"batch status:         {hist}")
    if settings.polish:
        if pol == 1:
            print("solution polish:      successful")
        elif pol < 0:
            print("solution polish:      unsuccessful")
    print(f"number of iterations: {i0}")
    if int(status[0]) in (con.OSQP_SOLVED, con.OSQP_SOLVED_INACCURATE):
        print(f"optimal objective:    {float(np.asarray(res.obj_val)[0]):.4f}")
    print(f"run time:             {run_time:.2e}s")
    print(f"optimal rho estimate: "
          f"{float(np.asarray(res.rho_estimate)[0]):.2e}")
    print()


class IterRowPrinter:
    """The reference's live-row cadence (print at iter 1, then every
    PRINT_INTERVAL — util.c:152-175), shared by the stateful Solver loop
    and the functional segmented driver so the two paths cannot drift."""

    def __init__(self, t0: float):
        import time

        self._time = time
        self.t0 = t0
        self.next_print = 1
        print_iter_header()

    def maybe(self, end: int, fetch) -> None:
        """Print a row for iteration ``end`` if the cadence calls for
        one; ``fetch()`` returns (obj, pri, dua, rho) device arrays and
        is only invoked when a row is actually printed."""
        if end >= self.next_print:
            obj, pri, dua, rho = fetch()
            print_iter_row(
                end, float(obj[0]), float(pri[0]), float(dua[0]),
                float(rho[0]), self._time.perf_counter() - self.t0,
            )
            self.next_print = (
                end // con.PRINT_INTERVAL + 1
            ) * con.PRINT_INTERVAL
