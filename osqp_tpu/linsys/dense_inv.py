"""Explicit-inverse Schur-complement backend (default, fastest on TPU).

Same reduction as :mod:`.dense_chol` (M = P + sigma I + A' diag(rho) A),
but at factorization time the *inverse operator* is materialized:

    W = [ M^-1     ]      (B, n+m, n)
        [ A M^-1   ]

so the per-iteration KKT solve is a single batched GEMV

    [x~; z~] = W @ (rhs_x + A'(rho * rhs_z))

with zero triangular substitutions.  Rationale: on TPU a batched
triangular solve with a width-1 right-hand side serializes into O(n)
tiny steps and starves the MXU, while W @ t is one memory-bound fused
matmul — this is the speed-of-light formulation for the batched regime
(thousands of instances/chip, BASELINE.json config 2).

Numerics: applying an explicit inverse has forward error O(kappa(M) eps),
the same order as triangular solves; Ruiz equilibration bounds kappa and
ADMM is a fixed-point iteration that tolerates inexact subproblem solves
(and polish performs iterative refinement, polish.c:134-181).  For
ill-conditioned problems select ``dense_chol`` or ``kkt_lu``.

Factorization cost: one batched Cholesky + two n-wide triangular solves
+ one GEMM — all MXU-dense, paid once at setup and once per rho update
(reference parity: qdldl_interface.c:305,407-409).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..linalg import mat_tvec
from .dense_chol import form_schur

# GEMV strategy for the per-iteration solve.  "mxu": einsum with
# precision="highest" (f32 emulated as multi-pass bf16 on the MXU —
# re-reads the big W operand per pass).  "vpu": broadcast-multiply +
# reduce on the VPU — single f32 pass over W, exact f32 FMA.  The hot
# GEMV is memory-bound, so the single-pass formulation wins; see
# tools/profile_iter.py.
_GEMV_MODE = os.environ.get("OSQP_TPU_GEMV_MODE", "vpu")


def init(P, A, sigma, rho_vec, **_):
    M = form_schur(P, A, sigma, rho_vec)
    L = jnp.linalg.cholesky(M)
    n = P.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=P.dtype), M.shape)
    # L^-1 via a *wide* (n-rhs) triangular solve — GEMM-rich, unlike the
    # width-1 solves the per-iteration path would need.
    Linv = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True, transpose_a=False
    )
    Minv = jnp.einsum(
        "bkn,bkm->bnm", Linv, Linv, preferred_element_type=P.dtype,
        precision="highest",
    )
    if A.shape[-2]:
        AMinv = jnp.einsum(
            "bmn,bnk->bmk", A, Minv, preferred_element_type=P.dtype,
            precision="highest",
        )
        W = jnp.concatenate([Minv, AMinv], axis=-2)  # (B, n+m, n)
    else:
        W = Minv
    return {"W": W}


def solve(factor, A, rho_vec, rhs_x, rhs_z, x0=None):
    n = rhs_x.shape[-1]
    t = rhs_x
    if _GEMV_MODE == "vpu":
        if A.shape[-2]:
            t = t + jnp.sum(A * (rho_vec * rhs_z)[:, :, None], axis=1)
        out = jnp.sum(factor["W"] * t[:, None, :], axis=-1)
    else:
        if A.shape[-2]:
            t = t + mat_tvec(A, rho_vec * rhs_z)
        out = jnp.einsum(
            "bkn,bn->bk", factor["W"], t, preferred_element_type=t.dtype,
            precision="highest",
        )
    return out[..., :n], out[..., n:]
