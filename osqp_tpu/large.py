"""Large sparse QPs — the n ~ 1e4..1e5 regime (LISWET/CONT-class).

The reference reaches this regime through its CSC kernel + sparse LDL'
(src/cs.c:28-318, lin_sys/direct/qdldl); the dense device layout of
:mod:`osqp_tpu.batch` cannot (O(n^2) memory).  This path keeps the data
sparse end-to-end: host CSR ingestion that never densifies, ELL operands
on device (:mod:`osqp_tpu.sparse_ops`), matrix-free Ruiz scaling, and
the Jacobi-preconditioned CG backend for the KKT solve.  The ADMM core,
termination logic and infeasibility certificates are the SAME jitted
code as the dense path — the operand type dispatches underneath
(osqp_tpu.linalg.mat_vec / mat_tvec / quad_form).

Restrictions vs the dense path (documented, enforced):
* ``linsys_solver`` is always ``cg`` (matrix-free);
* ``polish`` is unsupported (the reduced-KKT polish is a dense-operand
  algorithm; the reference also treats polish as optional);
* instance batching shares one sparsity pattern (scenario batches);
* the factor-time convexity check is skipped — non-convexity surfaces
  as runtime divergence (OSQP_NON_CVX), the reference's second detection
  path (auxil.c:699-706).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import scipy.sparse as sp

from . import constants as con
from .batch import BatchSolveResults, _solve_segmented, make_config
from .sparse_ops import ell_from_scipy
from .solver import Info, Results, Settings, update_csc_values, validate_settings
from .types import DynSettings


def prepare_sparse(P, q, A, l, u, settings: dict):
    """Shared sparse-entry preparation: settings validation (cg-only,
    polish rejected), dtype resolution, ELL operand construction, and
    the static/dynamic configs.  Used by :func:`solve_sparse` and the
    mesh-sharded entry (parallel/intra.py) so the contract lives in one
    place.  Returns (s, dtype, cfg, dyn, P_ell, A_ell, q2d, l2d, u2d)
    with q/l/u clamped device-ready (B, ·) float64 numpy."""
    import jax.numpy as jnp
    import jax

    settings.setdefault("linsys_solver", "cg")
    s = Settings(**settings)
    validate_settings(s)
    if s.linsys_solver != "cg":
        raise con.OSQPError(
            con.ErrorCode.SETTINGS_VALIDATION_ERROR,
            "the sparse path supports only the matrix-free 'cg' backend",
        )
    if s.polish:
        raise con.OSQPError(
            con.ErrorCode.SETTINGS_VALIDATION_ERROR,
            "polish is not supported on the sparse path",
        )

    q = np.atleast_2d(np.asarray(q, np.float64))
    B, n = q.shape
    l = np.atleast_2d(np.asarray(l, np.float64))
    u = np.atleast_2d(np.asarray(u, np.float64))
    # the reference's finite infinity (constants.h:98-100)
    l = np.clip(np.broadcast_to(l, (B, l.shape[-1])), -con.OSQP_INFTY, con.OSQP_INFTY)
    u = np.clip(np.broadcast_to(u, (B, u.shape[-1])), -con.OSQP_INFTY, con.OSQP_INFTY)
    m = l.shape[-1]

    if s.dtype is not None:
        dtype = jnp.dtype(s.dtype)
    else:
        dtype = jnp.dtype(
            jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        )

    P_ell = ell_from_scipy(sp.csr_matrix(P), dtype, batch=B, sym_from_triu=True)
    A_ell = ell_from_scipy(sp.csr_matrix(A), dtype, batch=B)
    if A_ell.shape != (m, n):
        raise con.OSQPError(
            con.ErrorCode.DATA_VALIDATION_ERROR,
            f"A shape {A_ell.shape} inconsistent with q/l/u ({m}, {n})",
        )

    cfg = make_config(n, m, s, dtype)
    dyn = DynSettings.make(
        dtype,
        sigma=s.sigma,
        alpha=s.alpha,
        eps_abs=s.eps_abs,
        eps_rel=s.eps_rel,
        eps_prim_inf=s.eps_prim_inf,
        eps_dual_inf=s.eps_dual_inf,
        adaptive_rho_tolerance=s.adaptive_rho_tolerance,
        delta=s.delta,
    )
    return s, dtype, cfg, dyn, P_ell, A_ell, q, l, u


def solve_sparse(P, q, A, l, u, x0=None, y0=None, **settings) -> BatchSolveResults:
    """Solve one sparse QP (or B sharing the sparsity pattern and data,
    with per-instance q/l/u) without ever densifying P or A.

    Args:
      P: scipy sparse (n, n), upper-triangular or full symmetric.
      q: (n,) or (B, n).
      A: scipy sparse (m, n).
      l, u: (m,) or (B, m).
      settings: reference setting names; ``linsys_solver`` must be
        ``"cg"`` (default here) and ``polish`` False.

    Returns :class:`BatchSolveResults` (B = 1 for 1-D inputs).
    """
    import jax.numpy as jnp

    s, dtype, cfg, dyn, P_ell, A_ell, q, l, u = prepare_sparse(
        P, q, A, l, u, settings
    )
    B, n = q.shape
    m = l.shape[-1]
    rho0 = jnp.full((B,), s.rho, dtype)
    if x0 is not None or y0 is not None:
        # reference osqp_warm_start semantics: either side alone is
        # allowed, the other defaults to zero (osqp.c:967-1010)
        x0 = (
            jnp.asarray(x0, dtype).reshape(B, n)
            if x0 is not None
            else jnp.zeros((B, n), dtype)
        )
        y0 = (
            jnp.asarray(y0, dtype).reshape(B, m)
            if y0 is not None
            else jnp.zeros((B, m), dtype)
        )

    return _solve_segmented(
        cfg, int(s.scaling), False, 0,
        P_ell, jnp.asarray(q, dtype), A_ell,
        jnp.asarray(l, dtype), jnp.asarray(u, dtype),
        rho0, dyn, x0, y0,
        time_limit=float(s.time_limit),
    )


# ---------------------------------------------------------------------------
# Stateful Solver-style API over the sparse path
# ---------------------------------------------------------------------------
class SparseSolver:
    """Solver-compatible stateful API for large sparse QPs.

    The familiar lifecycle (osqp.c:76-283 setup, update_* entry points,
    warm starting across re-solves) over :func:`solve_sparse`.  There is
    no cached factorization to preserve — the cg backend's only
    per-solve state is the Jacobi diagonal, rebuilt from the (possibly
    updated) values each solve — so updates are host-side O(nnz) value
    edits on the stored CSC pattern with the reference's indexed-update
    semantics (osqp.c:1012-1279), and each ``solve()`` re-enters the
    jitted path (one compile per shape; re-solves reuse it).

    Same restrictions as :func:`solve_sparse`: cg backend, no polish.
    """

    def __init__(self, P=None, q=None, A=None, l=None, u=None, **settings):
        self._is_setup = False
        if P is not None or q is not None:
            self.setup(P=P, q=q, A=A, l=l, u=u, **settings)

    def setup(self, P=None, q=None, A=None, l=None, u=None, **settings):
        from .sparse import validate_problem

        t0 = time.perf_counter()
        settings.setdefault("linsys_solver", "cg")
        unknown = set(settings) - {f.name for f in dataclasses.fields(Settings)}
        if unknown:
            raise con.OSQPError(
                con.ErrorCode.SETTINGS_VALIDATION_ERROR,
                f"unknown settings: {sorted(unknown)}",
            )
        self.settings = Settings(**settings)
        validate_settings(self.settings)
        if self.settings.linsys_solver != "cg":
            raise con.OSQPError(
                con.ErrorCode.SETTINGS_VALIDATION_ERROR,
                "SparseSolver supports only the matrix-free 'cg' backend",
            )
        if self.settings.polish:
            raise con.OSQPError(
                con.ErrorCode.SETTINGS_VALIDATION_ERROR,
                "polish is not supported on the sparse path",
            )
        # Canonical host data; triu-CSC P / CSC A keep the patterns the
        # reference's indexed updates address (osqp.c:1031-1062).
        Pu, qv, Ac, lv, uv, n, m = validate_problem(P, q, A, l, u)
        self._Pu, self._Ac = Pu, Ac
        self._q, self._l, self._u = qv, lv, uv
        self.n, self.m = n, m
        self._x0 = self._y0 = None
        self.info = Info(rho_estimate=float(self.settings.rho))
        self.info.setup_time = time.perf_counter() - t0
        self._is_setup = True
        if self.settings.verbose:
            from .utils.printing import print_setup_header

            print_setup_header(self)
        return self

    def _require_setup(self):
        if not self._is_setup:
            raise con.OSQPError(
                con.ErrorCode.WORKSPACE_NOT_INIT_ERROR,
                "Workspace not initialized",
            )

    # -- lifecycle ---------------------------------------------------------
    def solve(self) -> Results:
        self._require_setup()
        t0 = time.perf_counter()
        kw = {
            f.name: getattr(self.settings, f.name)
            for f in dataclasses.fields(Settings)
        }
        x0 = y0 = None
        if self.settings.warm_start and (
            self._x0 is not None or self._y0 is not None
        ):
            x0, y0 = self._x0, self._y0
        res = solve_sparse(
            self._Pu, self._q, self._Ac, self._l, self._u, x0=x0, y0=y0, **kw
        )
        sv = int(np.asarray(res.status_val)[0])
        self.info.status_val = sv
        self.info.status = con.STATUS_MESSAGE.get(sv, "?")
        self.info.iter = int(np.asarray(res.iter)[0])
        self.info.obj_val = float(np.asarray(res.obj_val)[0])
        self.info.pri_res = float(np.asarray(res.pri_res)[0])
        self.info.dua_res = float(np.asarray(res.dua_res)[0])
        self.info.rho_updates = int(np.asarray(res.rho_updates)[0])
        self.info.rho_estimate = float(np.asarray(res.rho_estimate)[0])
        self.info.solve_time = time.perf_counter() - t0
        self.info.run_time = self.info.setup_time + self.info.update_time + self.info.solve_time
        if self.settings.verbose:
            from .utils.printing import print_summary_footer

            # per-iteration rows are not printed on the sparse path
            print_summary_footer(self)
        x = np.asarray(res.x)[0]
        y = np.asarray(res.y)[0]
        if self.settings.warm_start and sv in (
            con.OSQP_SOLVED,
            con.OSQP_SOLVED_INACCURATE,
            con.OSQP_MAX_ITER_REACHED,
        ):
            self._x0, self._y0 = x.copy(), y.copy()
        pinf = sv in (con.OSQP_PRIMAL_INFEASIBLE,
                      con.OSQP_PRIMAL_INFEASIBLE_INACCURATE)
        dinf = sv in (con.OSQP_DUAL_INFEASIBLE,
                      con.OSQP_DUAL_INFEASIBLE_INACCURATE)
        return Results(
            x=x if not (pinf or dinf) else np.full(self.n, np.nan),
            y=y if not (pinf or dinf) else np.full(self.m, np.nan),
            prim_inf_cert=np.asarray(res.prim_inf_cert)[0] if pinf else None,
            dual_inf_cert=np.asarray(res.dual_inf_cert)[0] if dinf else None,
            info=self.info,
        )

    def warm_start(self, x=None, y=None):
        """osqp_warm_start (osqp.c:1399-1441)."""
        self._require_setup()
        if x is not None:
            self._x0 = np.asarray(x, np.float64).reshape(self.n)
        if y is not None:
            self._y0 = np.asarray(y, np.float64).reshape(self.m)

    # -- data updates (host O(nnz); next solve picks them up) --------------
    def _tick_update(self, t0):
        self.info.update_time += time.perf_counter() - t0

    def update_lin_cost(self, q_new):
        self._require_setup()
        t0 = time.perf_counter()
        self._q = np.asarray(q_new, np.float64).reshape(self.n)
        self._tick_update(t0)

    def update_bounds(self, l=None, u=None):
        from .sparse import clamp_bounds

        self._require_setup()
        t0 = time.perf_counter()
        l_new = clamp_bounds(l).reshape(self.m) if l is not None else self._l
        u_new = clamp_bounds(u).reshape(self.m) if u is not None else self._u
        if np.any(l_new > u_new):
            raise con.OSQPError(
                con.ErrorCode.DATA_VALIDATION_ERROR,
                "lower bound must be lower than or equal to upper bound",
            )
        self._l, self._u = l_new, u_new
        self._tick_update(t0)

    def update_lower_bound(self, l_new):
        self.update_bounds(l=l_new)

    def update_upper_bound(self, u_new):
        self.update_bounds(u=u_new)

    def update_P(self, Px=None, Px_idx=None, **_):
        """osqp_update_P (osqp.c:1012-1090): values on the triu pattern."""
        self._require_setup()
        t0 = time.perf_counter()
        update_csc_values(self._Pu, Px, Px_idx, "P")
        self._tick_update(t0)

    def update_A(self, Ax=None, Ax_idx=None, **_):
        """osqp_update_A (osqp.c:1092-1169)."""
        self._require_setup()
        t0 = time.perf_counter()
        update_csc_values(self._Ac, Ax, Ax_idx, "A")
        self._tick_update(t0)

    def update_P_A(self, Px=None, Px_idx=None, Ax=None, Ax_idx=None):
        if Px is not None:
            self.update_P(Px, Px_idx)
        if Ax is not None:
            self.update_A(Ax, Ax_idx)

    def update_rho(self, rho_new):
        self._require_setup()
        if not rho_new > 0:
            raise con.OSQPError(
                con.ErrorCode.SETTINGS_VALIDATION_ERROR, "rho must be positive"
            )
        self.settings = dataclasses.replace(self.settings, rho=float(rho_new))

    # -- settings setters (reference osqp_update_* surface) ----------------
    def _set(self, **kw):
        self._require_setup()
        candidate = dataclasses.replace(self.settings, **kw)
        validate_settings(candidate)  # reject BEFORE mutating state
        self.settings = candidate

    def update_max_iter(self, v):
        self._set(max_iter=int(v))

    def update_eps_abs(self, v):
        self._set(eps_abs=float(v))

    def update_eps_rel(self, v):
        self._set(eps_rel=float(v))

    def update_eps_prim_inf(self, v):
        self._set(eps_prim_inf=float(v))

    def update_eps_dual_inf(self, v):
        self._set(eps_dual_inf=float(v))

    def update_alpha(self, v):
        self._set(alpha=float(v))

    def update_verbose(self, v):
        self._set(verbose=bool(v))

    def update_scaled_termination(self, v):
        self._set(scaled_termination=bool(v))

    def update_check_termination(self, v):
        self._set(check_termination=int(v))

    def update_warm_start(self, v):
        self._set(warm_start=bool(v))
        if not v:
            self._x0 = self._y0 = None

    def update_time_limit(self, v):
        self._set(time_limit=float(v))
