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

# Factorization strategy.  "recursive": blocked 2x2 Schur recursion —
# pure batched GEMMs on the MXU (ops/spd_inverse.py), ~30x faster than
# "chol" (jnp cholesky + triangular solves, which serialize into O(n)
# panel steps on TPU; see tools/profile_setup.py).
_FACTOR_MODE = os.environ.get("OSQP_TPU_FACTOR_MODE", "recursive")

# Storage dtype for the streamed operator blocks (and the A copy used
# in rhs assembly).  "bfloat16" halves the hot loop's HBM traffic but a
# *fixed* ~2e-3 operator error stalls ADMM above the default 1e-3
# tolerances (measured: 0% solved at max_iter) — usable only with loose
# eps or a future in-kernel refinement step.  Keep "float32".
_W_DTYPE = os.environ.get("OSQP_TPU_W_DTYPE", "float32")

# Batch-minor operand layout for the hot loop.  XLA stores f32 arrays in
# (8, 128) tiles over the last two dims, so batch-major operands pad
# n=100 -> 104/128 etc. (~+31% HBM traffic; see docs/performance.md).
# With the *batch* as the minor (lane) dimension — Minv (n, n, B),
# (M^-1 A') (n, m, B), A (m, n, B) — padding falls to the sublane dim
# only (~+2% for typical shapes, 0 when n, m are multiples of 8) and the
# GEMV reductions become outer-axis sums (plain vector adds on the VPU).
# Vectors stay batch-major; the per-iteration transposes of (B, n)/(B, m)
# vectors are noise next to the operand streams.
_BATCH_MINOR = os.environ.get("OSQP_TPU_BATCH_MINOR", "0") == "1"


def _chol_inverse(M):
    """Explicit inverse via XLA cholesky + wide triangular solves —
    numerically the classic route, but its sequential panel steps are
    ~30x slower than the recursive path on TPU (tools/profile_setup.py)."""
    n = M.shape[-1]
    L = jnp.linalg.cholesky(M)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape)
    Linv = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True, transpose_a=False
    )
    return jnp.einsum(
        "bkn,bkm->bnm", Linv, Linv, preferred_element_type=M.dtype,
        precision="highest",
    )


def init(P, A, sigma, rho_vec, **_):
    M = form_schur(P, A, sigma, rho_vec)
    n = P.shape[-1]
    if _FACTOR_MODE == "recursive" and n:
        from ..ops.spd_inverse import spd_inverse

        X = spd_inverse(M)
        # Residual guard: if any instance's inverse is inaccurate
        # (kappa beyond what the recursion+Newton-Schulz handles in this
        # dtype), recompute the whole batch via cholesky.  NaN instances
        # (non-PD) do NOT trigger the fallback — NaN is the convexity
        # signal and the cholesky route would produce it too.
        R = jnp.eye(n, dtype=M.dtype) - jnp.einsum(
            "bij,bjk->bik", M, X, preferred_element_type=M.dtype,
            precision="highest",
        )
        resid = jnp.max(jnp.abs(R), axis=(-2, -1))
        tol = 1e-3 if M.dtype == jnp.float32 else 1e-8
        bad = jnp.any(resid > tol)  # NaN > tol is False
        Minv = jax.lax.cond(bad, _chol_inverse, lambda M_: X, M)
    else:
        Minv = _chol_inverse(M) if n else M
    if A.shape[-2]:
        # (A M^-1)' = M^-1 A' stored transposed, (B, n, m): both
        # per-iteration GEMV reductions then contract the *second-to-last*
        # (sublane) axis — the cheap reduction direction on the VPU
        # (M^-1 is symmetric, so it contracts either way).
        AMinvT = jnp.einsum(
            "bnk,bmk->bnm", Minv, A, preferred_element_type=P.dtype,
            precision="highest",
        )
    else:
        AMinvT = jnp.zeros((P.shape[0], n, 0), P.dtype)
    # Layout/storage modes are mutually exclusive; batch-minor wins if
    # both env vars are set (the bf16 mode is a documented-broken
    # experiment anyway).
    if _BATCH_MINOR:
        bm = lambda a: jnp.transpose(a, (1, 2, 0))  # one-time relayout
        return {
            "Minv_bm": bm(Minv),       # (n, n, B)
            "AMinvT_bm": bm(AMinvT),   # (n, m, B)
            "A_bm": bm(A),             # (m, n, B)
        }
    if _W_DTYPE != "float32" and P.dtype == jnp.float32:
        wdt = jnp.dtype(_W_DTYPE)
        return {
            "Minv": Minv.astype(wdt),
            "AMinvT": AMinvT.astype(wdt),
            "A16": A.astype(wdt),
        }
    return {"Minv": Minv, "AMinvT": AMinvT}


def select_factor(upd, new, old):
    """Per-instance factor select for rho adaptation — batch-minor
    leaves mask the *last* axis, batch-major ones the first."""

    def sel(key, n, o):
        if n.ndim == 0:
            return n
        if key.endswith("_bm"):
            return jnp.where(upd[(None,) * (n.ndim - 1)], n, o)
        return jnp.where(upd.reshape(upd.shape + (1,) * (n.ndim - 1)), n, o)

    return {k: sel(k, new[k], old[k]) for k in new}


def gather_factor(factor, idx):
    """Instance gather for the compaction driver — batch axis is last
    for ``*_bm`` leaves, first otherwise."""
    return {
        k: (a[..., idx] if k.endswith("_bm") else a[idx])
        for k, a in factor.items()
    }


def fused_step(factor, data, dyn, rs, it, active):
    """One fully-fused ADMM iteration in a single Pallas kernel
    (TPU/f32 only; see ops/fused_iter.py).  Returns
    (x+, z+, y+, dx_raw, dy_raw) with (x,z,y) frozen where inactive."""
    from ..ops.fused_iter import fused_iteration

    return fused_iteration(
        factor, data.A, dyn.sigma, dyn.alpha, rs.rho_vec, rs.rho_inv_vec,
        it.x, it.z, it.y, data.q, data.l, data.u, active,
    )


def solve(factor, A, rho_vec, rhs_x, rhs_z, x0=None):
    if "Minv_bm" in factor:
        # Batch-minor path: operands (., ., B); reductions over axis 0.
        t = rhs_x.T  # (n, B)
        if A.shape[-2]:
            vT = (rho_vec * rhs_z).T  # (m, B)
            t = t + jnp.sum(factor["A_bm"] * vT[:, None, :], axis=0)
        x_t = jnp.sum(factor["Minv_bm"] * t[:, None, :], axis=0)
        z_t = jnp.sum(factor["AMinvT_bm"] * t[:, None, :], axis=0)
        return x_t.T, z_t.T
    t = rhs_x
    if "A16" in factor:
        A = factor["A16"]  # low-precision streamed copy
    if _GEMV_MODE == "vpu":
        if A.shape[-2]:
            t = t + jnp.sum(A * (rho_vec * rhs_z)[:, :, None], axis=1)
        # Sublane-axis contractions (see init); Minv symmetric.
        x_t = jnp.sum(factor["Minv"] * t[:, :, None], axis=1)
        z_t = jnp.sum(factor["AMinvT"] * t[:, :, None], axis=1)
    else:
        if A.shape[-2]:
            t = t + mat_tvec(A, rho_vec * rhs_z)
        gemv = lambda W: jnp.einsum(
            "bnk,bn->bk", W, t, preferred_element_type=t.dtype,
            precision="highest",
        )
        x_t, z_t = gemv(factor["Minv"]), gemv(factor["AMinvT"])
    return x_t, z_t
