"""Batched multi-QP solving — the TPU-native scaling axis.

The reference is strictly single-problem, single-threaded (SURVEY §2);
on TPU the first-class parallelism is *instance batching*: B problems of
identical shape (n, m) solved by ONE compiled program whose every op is
batched over the leading axis.  Per-instance termination freezes
finished instances (masked selects) while the global loop runs until all
are done; statuses, iteration counts, residuals and infeasibility
certificates are all per-instance.

The entire pipeline — Ruiz scaling, rho classification, factorization,
ADMM loop, polish, unscaling, certificate normalization — is one jit.
For multi-chip scaling see :mod:`osqp_tpu.parallel`.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as con
from . import linsys as linsys_registry
from .admm import set_rho_state, solve_core
from .linalg import bwhere, norm_inf, with_high_precision
from .polish import polish as polish_fn
from .scaling import scale_data, unscale_solution
from .solver import Settings, _resolve_rho_interval, validate_settings
from .types import DynSettings, Iterates, QPData, ScalingData, StaticConfig


class BatchSolveResults(NamedTuple):
    x: Any  # (B, n)
    y: Any  # (B, m)
    status_val: Any  # (B,) int32
    iter: Any  # (B,) int32
    obj_val: Any  # (B,)
    pri_res: Any  # (B,)
    dua_res: Any  # (B,)
    rho_updates: Any  # (B,) int32
    rho_estimate: Any  # (B,)
    status_polish: Any  # (B,) int32 (0 = not run, 1 = success, -1 = failed)
    prim_inf_cert: Any  # (B, m) (rows valid where status is primal infeasible)
    dual_inf_cert: Any  # (B, n)


@partial(
    jax.jit,
    static_argnames=("cfg", "scaling_iters", "do_polish", "refine_iter"),
)
@with_high_precision
def solve_batch_jit(
    cfg: StaticConfig,
    scaling_iters: int,
    do_polish: bool,
    refine_iter: int,
    P,
    q,
    A,
    l,
    u,
    rho0,
    dyn: DynSettings,
    x0,
    y0,
):
    """End-to-end batched solve; all inputs unscaled device arrays."""
    B, n = q.shape
    m = cfg.m
    dtype = q.dtype

    data = QPData(P=P, q=q, A=A, l=l, u=u)
    if scaling_iters > 0:
        scaled, scl = scale_data(data, scaling_iters)
    else:
        scaled, scl = data, ScalingData.identity(B, n, m, dtype)

    rho_state = set_rho_state(scaled, rho0)
    factor = linsys_registry.init_factor(
        cfg, scaled.P, scaled.A, dyn.sigma, rho_state.rho_vec
    )

    # Warm start (osqp.c:942-965): scale iterates, z = A x
    if x0 is None:
        it = Iterates.cold(B, n, m, dtype)
    else:
        xs = x0 * scl.Dinv
        ys = y0 * scl.Einv * scl.c[:, None] if m else jnp.zeros((B, m), dtype)
        zs = jnp.einsum("bmn,bn->bm", scaled.A, xs, precision="highest")
        it = Iterates(x=xs, z=zs, y=ys)

    result = solve_core(cfg, scaled, scl, dyn, rho_state, factor, it)
    info = result.info
    it = result.iterates

    status_polish = jnp.zeros((B,), jnp.int32)
    obj_val, pri_res, dua_res = info.obj_val, info.pri_res, info.dua_res
    if do_polish:
        solved = info.status_val == con.OSQP_SOLVED
        pol = polish_fn(
            cfg, scaled, scl, dyn, it.x, it.z, it.y, pri_res, dua_res, refine_iter
        )
        ok = solved & pol.success
        it = Iterates(
            x=bwhere(ok, pol.x, it.x),
            z=bwhere(ok, pol.z, it.z),
            y=bwhere(ok, pol.y, it.y),
        )
        obj_val = jnp.where(ok, pol.obj_val, obj_val)
        pri_res = jnp.where(ok, pol.pri_res, pri_res)
        dua_res = jnp.where(ok, pol.dua_res, dua_res)
        status_polish = jnp.where(
            solved, jnp.where(ok, 1, -1), 0
        ).astype(jnp.int32)

    # store_solution (auxil.c:524-562): unscale or NaN-fill + certificates
    sv = info.status_val
    has_sol = (
        (sv != con.OSQP_PRIMAL_INFEASIBLE)
        & (sv != con.OSQP_PRIMAL_INFEASIBLE_INACCURATE)
        & (sv != con.OSQP_DUAL_INFEASIBLE)
        & (sv != con.OSQP_DUAL_INFEASIBLE_INACCURATE)
        & (sv != con.OSQP_NON_CVX)
    )
    x_u, y_u = unscale_solution(it.x, it.y, scl)
    nan = jnp.asarray(jnp.nan, dtype)
    x_out = jnp.where(has_sol[:, None], x_u, nan)
    y_out = jnp.where(has_sol[:, None], y_u, nan) if m else y_u

    def _normalize(v):
        nrm = norm_inf(v)
        return v / jnp.where(nrm > 0, nrm, 1.0)[:, None]

    prim_cert = _normalize(result.delta_y) if m else result.delta_y
    dual_cert = _normalize(result.delta_x)

    return BatchSolveResults(
        x=x_out,
        y=y_out,
        status_val=sv,
        iter=info.iter,
        obj_val=obj_val,
        pri_res=pri_res,
        dua_res=dua_res,
        rho_updates=info.rho_updates,
        rho_estimate=info.rho_estimate,
        status_polish=status_polish,
        prim_inf_cert=prim_cert,
        dual_inf_cert=dual_cert,
    )


def make_config(n: int, m: int, settings: Settings, dtype) -> StaticConfig:
    return StaticConfig(
        n=n,
        m=m,
        max_iter=int(settings.max_iter),
        check_termination=int(settings.check_termination),
        adaptive_rho=bool(settings.adaptive_rho),
        adaptive_rho_interval=_resolve_rho_interval(settings),
        scaled_termination=bool(settings.scaled_termination),
        linsys_solver=str(settings.linsys_solver),
        dtype=str(jnp.dtype(dtype)),
        cg_max_iter=int(settings.cg_max_iter),
        cg_tol_fraction=float(settings.cg_tol_fraction),
        block_size=int(settings.block_size),
    )


def solve_batch(P, q, A, l, u, x0=None, y0=None, **settings) -> BatchSolveResults:
    """Solve B same-shape QPs in one compiled batched program.

    Args:
      P: (B, n, n) dense symmetric cost matrices.
      q: (B, n); A: (B, m, n); l, u: (B, m) (entries beyond +-1e30 are
         clamped to the reference's finite infinity, constants.h:98-100).
      x0, y0: optional warm starts (unscaled).
      **settings: reference setting names (see :class:`Settings`).

    Returns a :class:`BatchSolveResults` of device arrays.
    """
    s = Settings(**settings)
    validate_settings(s)

    q = jnp.asarray(q)
    if q.ndim != 2:
        raise ValueError("q must be (B, n)")
    B, n = q.shape
    if s.dtype is not None:
        dtype = jnp.dtype(s.dtype)
    else:
        dtype = jnp.dtype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    P = jnp.asarray(P, dtype)
    q = q.astype(dtype)
    A = jnp.asarray(A, dtype)
    m = A.shape[1]
    clamp = lambda v: jnp.clip(jnp.asarray(v, dtype), -con.OSQP_INFTY, con.OSQP_INFTY)
    l = clamp(l)
    u = clamp(u)

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
    rho0 = jnp.full((B,), s.rho, dtype)
    if x0 is not None:
        x0 = jnp.asarray(x0, dtype)
        y0 = jnp.asarray(y0, dtype) if y0 is not None else jnp.zeros((B, m), dtype)

    return solve_batch_jit(
        cfg,
        int(s.scaling),
        bool(s.polish),
        int(s.polish_refine_iter),
        P,
        q,
        A,
        l,
        u,
        rho0,
        dyn,
        x0,
        y0,
    )
