"""Modified Ruiz equilibration, batched and jit-pure.

Reference: src/scaling.c:44-156.  Each sweep:

1. d_j = inf-norm of KKT column j over [P; A],  e_i = inf-norm of row i of A
2. limit to [MIN_SCALING -> 1, MAX_SCALING], take 1/sqrt
3. P <- dPd, A <- eAd, q <- dq;  accumulate D *= d, E *= e
4. cost scaling: c_t = 1 / limit(max(mean_j maxcol_j |P|, limit(||q||_inf)))
   P *= c_t, q *= c_t, c *= c_t

Finally l <- E l, u <- E u and inverses are stored.

The reference runs this matrix-free over CSC (scaling.c:28-42); here P is
dense symmetric so column and row norms are plain max-reductions that XLA
fuses into two passes per sweep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .constants import MAX_SCALING, MIN_SCALING
from .types import QPData, ScalingData


def limit_scaling(v: jax.Array) -> jax.Array:
    """scaling.c:7-14: values below MIN_SCALING -> 1, above MAX_SCALING -> MAX."""
    v = jnp.where(v < MIN_SCALING, jnp.ones_like(v), v)
    return jnp.minimum(v, MAX_SCALING)


def _col_norms_kkt(P: jax.Array, A: jax.Array):
    """Inf-norms of the columns of [P A'; A 0] (scaling.c:28-42).

    d over variable columns: max(colnorm(P), colnorm(A));
    e over constraint columns: rownorm(A).  P is symmetric dense, so
    colnorm(P) equals the reference's mat_inf_norm_cols_sym_triu.
    """
    Pn = jnp.max(jnp.abs(P), axis=-2) if P.shape[-1] else P.sum(axis=-2)
    if A.shape[-2]:  # m > 0
        An_col = jnp.max(jnp.abs(A), axis=-2)  # (B, n)
        e = jnp.max(jnp.abs(A), axis=-1)  # (B, m)
        d = jnp.maximum(Pn, An_col)
    else:
        e = jnp.zeros(A.shape[:-1], A.dtype)
        d = Pn
    return d, e


def scale_data(data: QPData, n_iters: int) -> tuple[QPData, ScalingData]:
    """Run ``n_iters`` Ruiz sweeps (scaling.c:44-156). Returns scaled data."""
    B, n = data.q.shape
    m = data.l.shape[-1]
    dtype = data.q.dtype

    def sweep(carry, _):
        P, A, q, c, D, E = carry

        d, e = _col_norms_kkt(P, A)
        d = 1.0 / jnp.sqrt(limit_scaling(d))
        e = 1.0 / jnp.sqrt(limit_scaling(e))

        P = d[:, :, None] * P * d[:, None, :]
        A = e[:, :, None] * A * d[:, None, :]
        q = d * q
        D = D * d
        E = E * e

        # Cost normalization (scaling.c:110-141)
        col_norm_P = jnp.max(jnp.abs(P), axis=-2) if n else P.sum(axis=-2)
        c_temp = jnp.mean(col_norm_P, axis=-1)
        inf_norm_q = limit_scaling(jnp.max(jnp.abs(q), axis=-1))
        c_temp = limit_scaling(jnp.maximum(c_temp, inf_norm_q))
        c_temp = 1.0 / c_temp

        P = c_temp[:, None, None] * P
        q = c_temp[:, None] * q
        c = c * c_temp
        return (P, A, q, c, D, E), None

    init = (
        data.P,
        data.A,
        data.q,
        jnp.ones((B,), dtype),
        jnp.ones((B, n), dtype),
        jnp.ones((B, m), dtype),
    )
    (P, A, q, c, D, E), _ = jax.lax.scan(sweep, init, None, length=n_iters)

    scl = ScalingData(c=c, cinv=1.0 / c, D=D, Dinv=1.0 / D, E=E, Einv=1.0 / E)
    scaled = QPData(P=P, q=q, A=A, l=E * data.l, u=E * data.u)
    return scaled, scl


def unscale_solution(x: jax.Array, y: jax.Array, scl: ScalingData):
    """scaling.c:177-192: x <- D x,  y <- cinv E y."""
    return scl.D * x, scl.cinv[:, None] * (scl.E * y)
