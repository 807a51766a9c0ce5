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

import numpy as np
import scipy.sparse as sp

from . import constants as con
from .batch import BatchSolveResults, _solve_segmented, make_config
from .sparse_ops import ell_from_scipy
from .solver import Settings, validate_settings
from .types import DynSettings


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
    import jax

    settings.setdefault("linsys_solver", "cg")
    s = Settings(**settings)
    validate_settings(s)
    if s.linsys_solver != "cg":
        raise con.OSQPError(
            con.ErrorCode.SETTINGS_VALIDATION_ERROR,
            "solve_sparse supports only the matrix-free 'cg' backend",
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
    l = np.broadcast_to(l, (B, l.shape[-1]))
    u = np.broadcast_to(u, (B, u.shape[-1]))
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
    clamp = lambda v: jnp.clip(
        jnp.asarray(v, dtype), -con.OSQP_INFTY, con.OSQP_INFTY
    )
    rho0 = jnp.full((B,), s.rho, dtype)
    if x0 is not None:
        x0 = jnp.asarray(x0, dtype).reshape(B, n)
        y0 = (
            jnp.asarray(y0, dtype).reshape(B, m)
            if y0 is not None
            else jnp.zeros((B, m), dtype)
        )

    return _solve_segmented(
        cfg, int(s.scaling), False, 0,
        P_ell, jnp.asarray(q, dtype), A_ell, clamp(l), clamp(u),
        rho0, dyn, x0, y0,
        time_limit=float(s.time_limit),
    )
