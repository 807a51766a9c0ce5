"""Pallas TPU kernel: one fully-fused ADMM iteration (dense_inv path).

The hot loop (auxil.c:161-225 semantics) is memory-bound: per iteration
it must stream the inverse-operator blocks M^-1 (B,n,n), A M^-1 (B,m,n)
and the constraint matrix A (B,m,n) from HBM.  Left to XLA this splits
into several kernels (rhs assembly, two GEMVs, elementwise updates, mask
selects), each with its own launch and vector re-reads; this kernel does
the entire iteration in one pass over the big operands:

    rhs_x = sigma x - q
    v     = rho z - y                      (= rho * rhs_z)
    t     = rhs_x + A' v                   (sublane reduction over m)
    x~    = M^-1 t,   z~ = A M^-1 t        (lane reduction over n)
    x+    = alpha x~ + (1-alpha) x
    z+    = clip(alpha z~ + (1-alpha) z + y/rho, l, u)
    y+    = y + rho (z_rel - z+)

with per-instance freezing (active mask) applied to (x, z, y) in-kernel.
Returns raw delta_x / delta_y (the caller masks them — they feed the
infeasibility certificates, auxil.c:185-225).

Grid: one program per TILE_B-instance slab; all operands stream
HBM->VMEM via BlockSpecs, compute on the VPU (the GEMVs are
broadcast-multiply + reduction: exact single-pass f32 FMA, no multi-pass
MXU emulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    sig_ref, al_ref,
    Minv_ref, AMinvT_ref, A_ref,
    x_ref, z_ref, y_ref, q_ref, l_ref, u_ref,
    rho_ref, rho_inv_ref, act_ref,
    x_out, z_out, y_out, dx_out, dy_out,
):
    sigma = sig_ref[0, 0]
    alpha = al_ref[0, 0]
    x = x_ref[:]
    z = z_ref[:]
    y = y_ref[:]
    rho = rho_ref[:]

    rhs_x = sigma * x - q_ref[:]
    v = rho * z - y  # rho * rhs_z
    # All three GEMV contractions reduce the *sublane* axis (axis=1),
    # the efficient reduction direction on the VPU (rows of a vreg add
    # with plain vector adds; lane reductions would shuffle).
    t = rhs_x + jnp.sum(A_ref[:] * v[:, :, None], axis=1)
    # x~ = M^-1 t (M^-1 symmetric); z~ = (A M^-1) t via its transpose
    x_t = jnp.sum(Minv_ref[:] * t[:, :, None], axis=1)
    z_t = jnp.sum(AMinvT_ref[:] * t[:, :, None], axis=1)

    one_m = 1.0 - alpha
    x_new = alpha * x_t + one_m * x
    z_rel = alpha * z_t + one_m * z
    z_new = jnp.clip(z_rel + rho_inv_ref[:] * y, l_ref[:], u_ref[:])
    dy = rho * (z_rel - z_new)

    act = act_ref[:]  # (TB, 1) 1.0/0.0
    x_out[:] = jnp.where(act > 0, x_new, x)
    z_out[:] = jnp.where(act > 0, z_new, z)
    y_out[:] = jnp.where(act > 0, y + dy, y)
    dx_out[:] = x_new - x
    dy_out[:] = dy


def _pick_tile(B: int, n: int, m: int, vmem_budget=10 * 2**20) -> int:
    per = 4 * (n * n + 2 * m * n + 6 * n + 10 * m)  # bytes per instance
    tb = max(1, vmem_budget // (2 * per))  # double-buffered
    for cand in (32, 16, 8, 4, 2, 1):
        if cand <= tb and B % cand == 0:
            return cand
    return 1


def fused_iteration(factor, A, dyn_sigma, dyn_alpha, rho_vec, rho_inv_vec,
                    x, z, y, q, l, u, active, interpret=False):
    """One fused ADMM iteration. Returns (x+, z+, y+, dx_raw, dy_raw);
    (x+, z+, y+) are already frozen where ``active`` is False."""
    B, n = x.shape
    m = z.shape[-1]
    Minv, AMinvT = factor["Minv"], factor["AMinvT"]
    tb = _pick_tile(B, n, m)
    grid = (B // tb,)

    dt = x.dtype
    bs = lambda *shape: pl.BlockSpec(
        (tb, *shape), lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    vec_n = bs(n)
    vec_m = bs(m)
    scal = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, n), dt),
        jax.ShapeDtypeStruct((B, m), dt),
        jax.ShapeDtypeStruct((B, m), dt),
        jax.ShapeDtypeStruct((B, n), dt),
        jax.ShapeDtypeStruct((B, m), dt),
    )
    act = active.astype(dt)[:, None]
    sig = jnp.asarray(dyn_sigma, dt).reshape(1, 1)
    al = jnp.asarray(dyn_alpha, dt).reshape(1, 1)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            scal, scal,
            bs(n, n), bs(n, m), bs(m, n),
            vec_n, vec_m, vec_m, vec_n, vec_m, vec_m,
            vec_m, vec_m, bs(1),
        ],
        out_specs=(vec_n, vec_m, vec_m, vec_n, vec_m),
        out_shape=out_shapes,
        interpret=interpret,
    )(sig, al, Minv, AMinvT, A, x, z, y, q, l, u, rho_vec, rho_inv_vec, act)
