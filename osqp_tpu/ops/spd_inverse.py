"""Batched SPD matrix inversion as pure GEMMs (MXU speed-of-light).

``jnp.linalg.cholesky`` + triangular solves lower to O(n) *sequential*
panel steps on TPU — profiling (tools/profile_setup.py) shows ~230ms for
8192 x (100x100) factors, ~20 GFLOP/s, two orders of magnitude below the
MXU.  This module computes the explicit inverse with a *recursive
blocked Cholesky*: joint recursion producing the Cholesky factor L and
its inverse T = L^-1 with nothing but batched GEMMs and closed-form 2x2
leaves, then M^-1 = T' T.

    M = [M11  M21']     L11, T11 = rec(M11)
        [M21  M22 ]     L21 = M21 T11'
                        L22, T22 = rec(M22 - L21 L21')
                        T21 = -T22 L21 T11

This is numerically the *same algorithm* as Cholesky-based inversion
(error ~ kappa * eps), unlike the naive 2x2 Schur-complement inverse
recursion whose error compounds as ~kappa^2 * eps and which measurably
fails (residual >> 1) on QP Schur complements where the equality-row
rho boost (1e3 x rho, auxil.c:84-95) drives kappa to 1e5+.

A symmetric Jacobi pre-equilibration (unit diagonal) bounds the
conditioning the recursion sees, and one optional Newton-Schulz step
X <- X(2I - MX) polishes the result; residual-based fallback in
``linsys.dense_inv`` guards pathological instances.

Non-PD inputs yield NaN organically (sqrt of a negative pivot), which
callers rely on exactly as they rely on cholesky NaNs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gemm(a, b):
    return jnp.einsum(
        "bij,bjk->bik", a, b, preferred_element_type=a.dtype, precision="highest"
    )


def _chol_inv_base2(M):
    """Closed-form L = chol(M), T = L^-1 for (B, 2, 2) blocks."""
    a = M[:, 0, 0]
    b = M[:, 1, 0]
    d = M[:, 1, 1]
    l11 = jnp.sqrt(a)  # NaN if a < 0 (non-PD)
    l21 = b / l11
    l22 = jnp.sqrt(d - l21 * l21)  # NaN if Schur pivot < 0
    z = jnp.zeros_like(a)
    t11 = 1.0 / l11
    t22 = 1.0 / l22
    t21 = -l21 * t11 * t22
    L = jnp.stack(
        [jnp.stack([l11, z], -1), jnp.stack([l21, l22], -1)], axis=-2
    )
    T = jnp.stack(
        [jnp.stack([t11, z], -1), jnp.stack([t21, t22], -1)], axis=-2
    )
    return L, T


def _chol_inv_base1(M):
    L = jnp.sqrt(M)
    return L, 1.0 / L


def _chol_inv_leaf_batchminor(M):
    """(L, L^-1) for (B, s, s) blocks via a BATCH-MINOR unrolled
    factorization: the block is transposed to (s, s, B) so the batch
    rides the 128-wide lane dimension and every step of the s-step
    Cholesky / forward-substitution is a fully dense elementwise op.

    Why: the deep closed-form recursion bottoms out in (B, 2, 2)-shaped
    tensors whose TPU tiling is (8, 128) — >99% padding — so each of
    the ~3 n/2 tiny ops near the leaves pays a full HBM round trip on
    garbage lanes; profiled at ~100 ms of the 8192 x (100x100) setup.
    Batch-minor layout makes the SAME arithmetic lane-dense: the whole
    s=32 leaf is ~s^3 B VPU flops with zero padding, plus two cheap
    transposes.  Top recursion levels stay batch-major GEMMs (MXU).
    """
    B, s = M.shape[0], M.shape[-1]
    A = jnp.transpose(M, (1, 2, 0))  # (s, s, B)
    # -- Cholesky, rank-1 right-looking, unrolled over the s columns --
    cols = []  # cols[k]: (s-k, B) = L[k:, k]
    for k in range(s):
        dk = jnp.sqrt(A[0, 0])  # (B,); NaN where not PD (contract)
        ck = A[1:, 0] / dk if s - k > 1 else None
        cols.append(
            jnp.concatenate([dk[None], ck], axis=0) if ck is not None
            else dk[None]
        )
        if s - k > 1:
            A = A[1:, 1:] - ck[:, None, :] * ck[None, :, :]
    z = jnp.zeros_like(M[:, 0, 0])  # (B,)
    L_rows = [
        jnp.stack([cols[j][i - j] if j <= i else z for j in range(s)], axis=0)
        for i in range(s)
    ]  # each (s, B)
    Lm = jnp.stack(L_rows, axis=0)  # (s, s, B) lower
    # -- T = L^-1 by forward substitution, unrolled over rows --
    eye = jnp.eye(s, dtype=M.dtype)
    rows = []  # rows[i]: (s, B) = T[i, :]
    for i in range(s):
        acc = eye[i][:, None]  # (s, 1) broadcasts over B
        if i > 0:
            prev = jnp.stack(rows[:i], axis=0)  # (i, s, B)
            acc = acc - jnp.sum(Lm[i, :i][:, None, :] * prev, axis=0)
        rows.append(acc / Lm[i, i][None, :])
    Tm = jnp.stack(rows, axis=0)  # (s, s, B)
    return jnp.transpose(Lm, (2, 0, 1)), jnp.transpose(Tm, (2, 0, 1))


def _chol_inv_leaf(M):
    """(L, L^-1) via lax cholesky + triangular solve.  Serializes into
    O(n) panel steps on TPU, so it is only used as the recursion leaf
    for LARGE matrices, where the batch is small (a large-n dense batch
    cannot fit in HBM anyway) and where unrolling the base-2 recursion
    would blow up the XLA graph (n leaves -> minutes of compile time)."""
    L = jnp.linalg.cholesky(M)
    eye = jnp.broadcast_to(jnp.eye(M.shape[-1], dtype=M.dtype), M.shape)
    T = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True
    )
    return L, T


def _chol_inv(M, leaf: int = 2, leaf_impl: str = "panel"):
    """Joint (L, L^-1) for (B, n, n) with n a power of two."""
    n = M.shape[-1]
    if n == 1:
        return _chol_inv_base1(M)
    if n == 2:
        return _chol_inv_base2(M)
    if n <= leaf:
        return (_chol_inv_leaf_batchminor(M) if leaf_impl == "bm"
                else _chol_inv_leaf(M))
    h = n // 2
    M11 = M[:, :h, :h]
    M21 = M[:, h:, :h]
    M22 = M[:, h:, h:]
    L11, T11 = _chol_inv(M11, leaf)
    L21 = _gemm(M21, jnp.swapaxes(T11, -1, -2))
    S = M22 - _gemm(L21, jnp.swapaxes(L21, -1, -2))
    L22, T22 = _chol_inv(S, leaf)
    T21 = -_gemm(T22, _gemm(L21, T11))
    zero = jnp.zeros_like(L21)
    ztop = jnp.swapaxes(zero, -1, -2)
    L = jnp.concatenate(
        [
            jnp.concatenate([L11, ztop], axis=-1),
            jnp.concatenate([L21, L22], axis=-1),
        ],
        axis=-2,
    )
    T = jnp.concatenate(
        [
            jnp.concatenate([T11, ztop], axis=-1),
            jnp.concatenate([T21, T22], axis=-1),
        ],
        axis=-2,
    )
    return L, T


def spd_inverse(M, newton_schulz: int = 1):
    """Inverse of batched SPD matrices (B, n, n); all work is batched
    GEMMs + elementwise leaves.  NaN where an instance is not PD."""
    n = M.shape[-1]
    if n == 0:
        return M

    # Symmetric Jacobi equilibration: exact (inv(M) = d inv(dMd) d),
    # bounds the spread the recursion sees.
    dg = jnp.diagonal(M, axis1=-2, axis2=-1)
    d = jnp.where(dg > 0, 1.0 / jnp.sqrt(jnp.where(dg > 0, dg, 1.0)),
                  jnp.asarray(jnp.nan, M.dtype))
    Ms = M * d[:, :, None] * d[:, None, :]

    npad = max(2, 1 << (n - 1).bit_length())  # next power of two >= n
    # Leaf size: pure closed-form base-2 recursion up to 512 (the
    # huge-batch hot path; graph stays small), panel leaves of npad/16
    # beyond (small-batch large-n regime; bounds the XLA graph at ~31
    # recursion nodes regardless of n).  OSQP_TPU_SPD_LEAF overrides the
    # small-matrix leaf (perf experiments: larger leaves trade the deep
    # tiny-GEMM recursion for a few serialized panel steps).
    import os

    _leaf_env = int(os.environ.get("OSQP_TPU_SPD_LEAF", "2"))
    # OSQP_TPU_SPD_LEAF_IMPL=bm runs the leaf in batch-minor layout
    # (lane-dense elementwise Cholesky, see _chol_inv_leaf_batchminor);
    # default "panel" keeps the lax cholesky/triangular-solve leaf.
    _leaf_impl = os.environ.get("OSQP_TPU_SPD_LEAF_IMPL", "panel")
    leaf = _leaf_env if npad <= 512 else npad // 16
    if npad != n:
        B = M.shape[0]
        Mp = jnp.broadcast_to(
            jnp.eye(npad, dtype=M.dtype), (B, npad, npad)
        ).at[:, :n, :n].set(Ms)
    else:
        Mp = Ms
    _, T = _chol_inv(Mp, leaf, _leaf_impl)
    X = jnp.einsum(
        "bkn,bkm->bnm", T, T, preferred_element_type=M.dtype,
        precision="highest",
    )
    if npad != n:
        X = X[:, :n, :n]
    eye2 = 2.0 * jnp.eye(n, dtype=M.dtype)
    for _ in range(newton_schulz):
        X = _gemm(X, eye2 - _gemm(Ms, X))
    return X * d[:, :, None] * d[:, None, :]
