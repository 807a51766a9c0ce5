"""Matrix-free preconditioned conjugate-gradient backend.

The "indirect solver" the reference lists as future work (ROADMAP.md:2)
and documents mathematically (docs/solver/index.rst:52-58): solve

    (P + sigma I + A' diag(rho) A) x~ = rhs_x + A' (rho * rhs_z)

without materializing the Schur complement.  Jacobi preconditioning with
diag(M) = diag(P) + sigma + sum_i rho_i A_ij^2.  ``init`` is O(n m) (no
factorization), so rho adaptation is nearly free — the reference avoids
frequent rho updates because each costs a full refactorization
(qdldl_interface.c:396-410); this backend removes that constraint.

Intended regime: large n where the O(n^3 / 3) Cholesky dominates, or
memory-bound batches.  Warm-started from the previous ADMM iterate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..linalg import mat_tvec, mat_vec, vec_dot


def init(P, A, sigma, rho_vec, cg_max_iter: int = 0, cg_tol_fraction: float = 1e-7, **_):
    from ..sparse_ops import ELLMatrix, ell_diagonal, ell_sq_colsums

    n = P.shape[-1]
    m = A.shape[-2]
    if isinstance(P, ELLMatrix):
        diagM = ell_diagonal(P) + sigma
    else:
        diagM = jnp.diagonal(P, axis1=-2, axis2=-1) + sigma
    if m:
        if isinstance(A, ELLMatrix):
            diagM = diagM + ell_sq_colsums(A, rho_vec)
        else:
            diagM = diagM + jnp.einsum(
                "bm,bmn->bn", rho_vec, A * A, precision="highest"
            )
    max_iter = int(cg_max_iter) if cg_max_iter else (n + m)
    B = rho_vec.shape[0] if m else (
        P.val.shape[0] if isinstance(P, ELLMatrix) else P.shape[0]
    )
    return {
        "P": P,
        "sigma": jnp.asarray(sigma, P.dtype),
        "dinv": 1.0 / diagM,
        "max_iter": jnp.asarray(max_iter, jnp.int32),
        "tol_frac": jnp.asarray(cg_tol_fraction, P.dtype),
        # Adaptive inexact-ADMM relative tolerance, driven by the outer
        # residuals at every termination check (see update_tolerance).
        # Starts at the static fraction, capped by the dtype's
        # loosening/exactness cap.
        "tol_rel": jnp.full(
            (B,),
            min(float(cg_tol_fraction), _cap_for(jnp.dtype(P.dtype))),
            P.dtype,
        ),
    }


# Loosening caps for the inexact-ADMM schedule, by dtype (round-4
# measurements on the corpus, tools logs in docs/performance.md):
#
# * f64: cap 1e-8 — effectively near-exact solves.  Measured: CVXQP1_L
#   collapses 18,300 -> 675 outer iterations (the loose schedule
#   DEADLOCKS on ill-conditioned problems: the inexactness floors the
#   dual residual, which keeps the tolerance ratio large, which keeps
#   the solves loose), while the well-conditioned banded-30k control
#   and LISWET1 are unchanged in iterations AND wall time (warm-started
#   CG near convergence exits in a few steps regardless of cap).
# * f32: cap 1e-2 as before — tolerances below ~1e-7 are unreachable in
#   f32 (CG would burn its full inner budget stagnating at the
#   precision floor), so loose early solves remain the right trade.
_TOL_REL_CAP_F32 = 1e-2
_TOL_REL_CAP_F64 = 1e-8


def _cap_for(dtype):
    return _TOL_REL_CAP_F32 if dtype == jnp.float32 else _TOL_REL_CAP_F64


def link_cg_floor(settings) -> float:
    """cg_tol_fraction that actually permits the requested outer eps:
    the inexact-solve floor must sit below the outer tolerance or the
    subproblem error caps outer convergence (observed: eps=1e-8 stalls
    at pri_res ~0.3 with the static 1e-7 default).  Zero tolerances are
    allowed individually; only positive ones bind."""
    eps_pos = [e for e in (settings.eps_abs, settings.eps_rel) if e > 0]
    floor = min(eps_pos) if eps_pos else 1.0
    ctf = float(settings.cg_tol_fraction)
    if floor < 1e-5:
        ctf = min(ctf, max(1e-2 * floor, 1e-12))
    return ctf


def update_tolerance(factor, tol_ratio, dyn):
    """Inexact-ADMM schedule: solve the subproblem loosely while the
    outer iteration is far from its tolerances, proportionally tighter
    as it closes in (classic summable-error condition: the subproblem
    error decays with the outer residual).  ``tol_ratio`` is the
    scale-free max(pri/eps_pri, dua/eps_dua) from the termination
    check, so the rule needs no unscaled/scaled conversion:

        tol_rel = clip(tol_frac * tol_ratio, tol_frac, 1e-2)

    i.e. exactly tol_frac at convergence, up to 1e-2 when >= 1e5
    tolerance-units away.  The reference lists the indirect solver as
    future work (ROADMAP.md:2); this schedule is what makes it
    competitive at large n."""
    tf = factor["tol_frac"]
    dtype = factor["dinv"].dtype
    cap = jnp.asarray(_cap_for(dtype), dtype)
    tol = jnp.clip(
        tf * tol_ratio.astype(dtype), jnp.minimum(tf, cap), cap
    )
    return {**factor, "tol_rel": tol}


def _matvec_M(P, A, sigma, rho_vec, v):
    out = mat_vec(P, v) + sigma * v
    if A.shape[-2]:
        out = out + mat_tvec(A, rho_vec * mat_vec(A, v))
    return out


def solve(factor, A, rho_vec, rhs_x, rhs_z, x0=None):
    P, sigma, dinv = factor["P"], factor["sigma"], factor["dinv"]
    b = rhs_x
    if A.shape[-2]:
        b = b + mat_tvec(A, rho_vec * rhs_z)

    x = x0 if x0 is not None else jnp.zeros_like(b)
    r = b - _matvec_M(P, A, sigma, rho_vec, x)
    z = dinv * r
    p = z
    rz = vec_dot(r, z)
    # Relative tolerance; tol_rel is the adaptive inexact-ADMM schedule
    # (update_tolerance), equal to tol_frac until the first check.
    tol = factor.get("tol_rel", factor["tol_frac"]) * jnp.linalg.norm(
        b, axis=-1
    )
    tol2 = jnp.maximum(tol * tol, jnp.asarray(1e-30, b.dtype))

    def cond(carry):
        k, _, r, *_ = carry
        return (k < factor["max_iter"]) & jnp.any(vec_dot(r, r) > tol2)

    def body(carry):
        k, x, r, z, p, rz = carry
        Mp = _matvec_M(P, A, sigma, rho_vec, p)
        denom = vec_dot(p, Mp)
        alpha = rz / jnp.where(denom > 0, denom, 1.0)
        # Freeze converged instances (alpha=0) to keep them bit-stable.
        alpha = jnp.where(vec_dot(r, r) > tol2, alpha, 0.0)[:, None]
        x = x + alpha * p
        r = r - alpha * Mp
        z = dinv * r
        rz_new = vec_dot(r, z)
        beta = (rz_new / jnp.where(rz > 0, rz, 1.0))[:, None]
        p = z + beta * p
        return (k + 1, x, r, z, p, rz_new)

    k0 = jnp.asarray(0, jnp.int32)
    _, x, *_ = jax.lax.while_loop(cond, body, (k0, x, r, z, p, rz))
    z_t = mat_vec(A, x)
    return x, z_t
