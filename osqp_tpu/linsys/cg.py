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
    n = P.shape[-1]
    m = A.shape[-2]
    diagM = jnp.diagonal(P, axis1=-2, axis2=-1) + sigma
    if m:
        diagM = diagM + jnp.einsum(
            "bm,bmn->bn", rho_vec, A * A, precision="highest"
        )
    max_iter = int(cg_max_iter) if cg_max_iter else (n + m)
    return {
        "P": P,
        "sigma": jnp.asarray(sigma, P.dtype),
        "dinv": 1.0 / diagM,
        "max_iter": jnp.asarray(max_iter, jnp.int32),
        "tol_frac": jnp.asarray(cg_tol_fraction, P.dtype),
    }


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
    tol2 = (factor["tol_frac"] * jnp.linalg.norm(b, axis=-1)) ** 2
    tol2 = jnp.maximum(tol2, jnp.asarray(1e-30, b.dtype))

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
