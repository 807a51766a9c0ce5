"""Residuals, tolerances, infeasibility certificates and status decisions.

Batched re-derivation of src/auxil.c:240-359 (residuals/tolerances),
auxil.c:361-512 (infeasibility certificates) and auxil.c:681-786
(check_termination).  All functions take/return arrays with leading batch
axis B.  Scaled problem data is used throughout; unscaling via the
D/E/c vectors happens exactly where the reference does it.

When ``settings.scaling == 0`` the scaling vectors are identity, making
the scaled/unscaled code paths coincide, so there is a single vectorized
path conditioned only on ``scaled_termination``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .constants import (
    MIN_SCALING,
    OSQP_DIVISION_TOL,
    OSQP_INFTY,
    OSQP_NON_CVX,
    OSQP_PRIMAL_INFEASIBLE,
    OSQP_PRIMAL_INFEASIBLE_INACCURATE,
    OSQP_DUAL_INFEASIBLE,
    OSQP_DUAL_INFEASIBLE_INACCURATE,
    OSQP_SOLVED,
    OSQP_SOLVED_INACCURATE,
)
from .linalg import mat_tvec, mat_vec, norm_inf, scaled_norm_inf, vec_dot
from .types import DynSettings, QPData, ScalingData, StaticConfig


class Products(NamedTuple):
    """The four matrix products update_info needs (auxil.c:240-318)."""

    Ax: jax.Array  # (B, m)
    Px: jax.Array  # (B, n)
    Aty: jax.Array  # (B, n)
    pri_vec: jax.Array  # (B, m) scaled primal residual  A x - z
    dua_vec: jax.Array  # (B, n) scaled dual residual    q + P x + A' y


def compute_products(data: QPData, x, z, y) -> Products:
    Ax = mat_vec(data.A, x)
    Px = mat_vec(data.P, x)
    Aty = mat_tvec(data.A, y)
    return Products(Ax=Ax, Px=Px, Aty=Aty, pri_vec=Ax - z, dua_vec=data.q + Px + Aty)


def residual_norms(cfg: StaticConfig, scl: ScalingData, pr: Products):
    """info->pri_res / dua_res (auxil.c:240-318).  m == 0 => pri_res = 0."""
    if cfg.scaled_termination:
        pri = norm_inf(pr.pri_vec)
        dua = norm_inf(pr.dua_vec)
    else:
        pri = scaled_norm_inf(scl.Einv, pr.pri_vec)
        dua = scl.cinv * scaled_norm_inf(scl.Dinv, pr.dua_vec)
    return pri, dua


def tolerances(
    cfg: StaticConfig,
    data: QPData,
    scl: ScalingData,
    pr: Products,
    z,
    eps_abs,
    eps_rel,
):
    """eps_pri (auxil.c:256-285) and eps_dua (auxil.c:320-359)."""
    if cfg.scaled_termination:
        rel_pri = jnp.maximum(norm_inf(z), norm_inf(pr.Ax))
        rel_dua = jnp.maximum(
            jnp.maximum(norm_inf(data.q), norm_inf(pr.Aty)), norm_inf(pr.Px)
        )
    else:
        rel_pri = jnp.maximum(
            scaled_norm_inf(scl.Einv, z), scaled_norm_inf(scl.Einv, pr.Ax)
        )
        rel_dua = scl.cinv * jnp.maximum(
            jnp.maximum(
                scaled_norm_inf(scl.Dinv, data.q),
                scaled_norm_inf(scl.Dinv, pr.Aty),
            ),
            scaled_norm_inf(scl.Dinv, pr.Px),
        )
    return eps_abs + eps_rel * rel_pri, eps_abs + eps_rel * rel_dua


def primal_infeasibility(
    cfg: StaticConfig,
    data: QPData,
    scl: ScalingData,
    delta_y,
    eps_prim_inf,
):
    """is_primal_infeasible (auxil.c:361-424).

    Returns (is_pinf (B,) bool, dy_proj (B, m)) where dy_proj is delta_y
    projected onto the polar of the recession cone of [l, u] — the
    reference performs this projection in-place (auxil.c:374-387) and the
    projected vector becomes the certificate.
    """
    if cfg.m == 0:
        B = delta_y.shape[0]
        return jnp.zeros((B,), bool), delta_y

    inf_u = data.u > OSQP_INFTY * MIN_SCALING
    inf_l = data.l < -OSQP_INFTY * MIN_SCALING
    dy = jnp.where(
        inf_u & inf_l,
        0.0,
        jnp.where(
            inf_u,
            jnp.minimum(delta_y, 0.0),
            jnp.where(inf_l, jnp.maximum(delta_y, 0.0), delta_y),
        ),
    )

    if cfg.scaled_termination:
        norm_dy = norm_inf(dy)
    else:
        norm_dy = scaled_norm_inf(scl.E, dy)

    # u' max(dy, 0) + l' min(dy, 0) on *scaled* data (auxil.c:400-403).
    ineq_lhs = vec_dot(data.u, jnp.maximum(dy, 0.0)) + vec_dot(
        data.l, jnp.minimum(dy, 0.0)
    )

    Atdy = mat_tvec(data.A, dy)
    if not cfg.scaled_termination:
        Atdy = scl.Dinv * Atdy

    is_pinf = (
        (norm_dy > OSQP_DIVISION_TOL)
        & (ineq_lhs < eps_prim_inf * norm_dy)
        & (norm_inf(Atdy) < eps_prim_inf * norm_dy)
    )
    return is_pinf, dy


def dual_infeasibility(
    cfg: StaticConfig,
    data: QPData,
    scl: ScalingData,
    delta_x,
    eps_dual_inf,
):
    """is_dual_infeasible (auxil.c:426-512). Returns (B,) bool."""
    if cfg.scaled_termination:
        norm_dx = norm_inf(delta_x)
        cost_scaling = jnp.ones_like(norm_dx)
    else:
        norm_dx = scaled_norm_inf(scl.D, delta_x)
        cost_scaling = scl.c

    thresh = cost_scaling * eps_dual_inf * norm_dx

    cond_q = vec_dot(data.q, delta_x) < thresh

    Pdx = mat_vec(data.P, delta_x)
    if not cfg.scaled_termination:
        Pdx = scl.Dinv * Pdx
    cond_P = norm_inf(Pdx) < thresh

    if cfg.m:
        Adx = mat_vec(data.A, delta_x)
        if not cfg.scaled_termination:
            Adx = scl.Einv * Adx
        # De Morgan over constraints (auxil.c:491-502); note eps*norm_dx
        # here is NOT cost-scaled, matching the reference exactly.
        t = eps_dual_inf * norm_dx
        bad = ((data.u < OSQP_INFTY * MIN_SCALING) & (Adx > t[:, None])) | (
            (data.l > -OSQP_INFTY * MIN_SCALING) & (Adx < -t[:, None])
        )
        cond_A = ~jnp.any(bad, axis=-1)
    else:
        cond_A = jnp.ones_like(cond_q)

    return (norm_dx > OSQP_DIVISION_TOL) & cond_q & cond_P & cond_A


class TermResult(NamedTuple):
    terminated: jax.Array  # (B,) bool
    status: jax.Array  # (B,) int32 (valid only where terminated)
    pri_res: jax.Array  # (B,)
    dua_res: jax.Array  # (B,)
    obj_at_term: jax.Array  # (B,) objective for infeasible/noncvx statuses
    dy_cert: jax.Array  # (B, m) certificate (projected, unscaled-at-term)
    dx_cert: jax.Array  # (B, n) certificate (unscaled-at-term)
    tol_ratio: jax.Array  # (B,) max(pri/eps_pri, dua/eps_dua): scale-free
    #                       distance from convergence in tolerance units
    #                       (drives the inexact-CG schedule, linsys/cg.py)


def check_termination(
    cfg: StaticConfig,
    data: QPData,
    scl: ScalingData,
    dyn: DynSettings,
    x,
    z,
    y,
    delta_x,
    delta_y,
    approximate: bool,
) -> TermResult:
    """Batched check_termination (auxil.c:681-786).

    Computes the products + residuals (update_info) and the full status
    decision.  ``approximate`` multiplies all four tolerances by 10
    (auxil.c:709-714).
    """
    pr = compute_products(data, x, z, y)
    pri_res, dua_res = residual_norms(cfg, scl, pr)

    mult = 10.0 if approximate else 1.0
    eps_abs = dyn.eps_abs * mult
    eps_rel = dyn.eps_rel * mult
    eps_pinf = dyn.eps_prim_inf * mult
    eps_dinf = dyn.eps_dual_inf * mult

    # Divergence => non-convex (auxil.c:699-706)
    non_cvx = (pri_res > OSQP_INFTY) | (dua_res > OSQP_INFTY)

    eps_pri, eps_dua = tolerances(cfg, data, scl, pr, z, eps_abs, eps_rel)

    if cfg.m == 0:
        prim_ok = jnp.ones_like(non_cvx)
        prim_inf = jnp.zeros_like(non_cvx)
        dy_proj = delta_y
    else:
        prim_ok = pri_res < eps_pri
        pinf, dy_proj = primal_infeasibility(cfg, data, scl, delta_y, eps_pinf)
        prim_inf = ~prim_ok & pinf

    dual_ok = dua_res < eps_dua
    dual_inf = ~dual_ok & dual_infeasibility(cfg, data, scl, delta_x, eps_dinf)

    solved = prim_ok & dual_ok

    i32 = lambda v: jnp.asarray(v, jnp.int32)
    if approximate:
        s_solved, s_pinf, s_dinf = (
            OSQP_SOLVED_INACCURATE,
            OSQP_PRIMAL_INFEASIBLE_INACCURATE,
            OSQP_DUAL_INFEASIBLE_INACCURATE,
        )
    else:
        s_solved, s_pinf, s_dinf = (
            OSQP_SOLVED,
            OSQP_PRIMAL_INFEASIBLE,
            OSQP_DUAL_INFEASIBLE,
        )

    status = jnp.where(
        non_cvx,
        i32(OSQP_NON_CVX),
        jnp.where(
            solved,
            i32(s_solved),
            jnp.where(prim_inf, i32(s_pinf), i32(s_dinf)),
        ),
    )
    terminated = non_cvx | solved | prim_inf | (~prim_inf & dual_inf)

    # Objective value at terminal status (auxil.c:704, 766, 781)
    dtype = pri_res.dtype
    obj_at_term = jnp.where(
        non_cvx,
        jnp.asarray(jnp.nan, dtype),
        jnp.where(
            prim_inf,
            jnp.asarray(OSQP_INFTY, dtype),
            jnp.asarray(-OSQP_INFTY, dtype),
        ),
    )

    # Certificate unscaling at termination (auxil.c:762-781): delta_y <- E dy,
    # delta_x <- D dx (only when scaling active and unscaled termination —
    # with identity scaling this is a no-op, so apply unconditionally).
    if cfg.scaled_termination:
        dy_cert, dx_cert = dy_proj, delta_x
    else:
        dy_cert = scl.E * dy_proj
        dx_cert = scl.D * delta_x

    tol_ratio = jnp.maximum(
        pri_res / jnp.maximum(eps_pri, OSQP_DIVISION_TOL),
        dua_res / jnp.maximum(eps_dua, OSQP_DIVISION_TOL),
    )

    return TermResult(
        terminated=terminated,
        status=status,
        pri_res=pri_res,
        dua_res=dua_res,
        obj_at_term=obj_at_term,
        dy_cert=dy_cert,
        dx_cert=dx_cert,
        tol_ratio=tol_ratio,
    )


def compute_rho_estimate(data: QPData, x, z, y, rho):
    """compute_rho_estimate (auxil.c:13-52) — all in *scaled* space.

    The reference reuses the residual vectors that update_info left in the
    x_prev/z_prev work buffers; here the products are recomputed from the
    (identical) iterates.
    """
    from .constants import RHO_MAX, RHO_MIN

    pr = compute_products(data, x, z, y)
    pri_res = norm_inf(pr.pri_vec)
    dua_res = norm_inf(pr.dua_vec)

    pri_norm = jnp.maximum(norm_inf(z), norm_inf(pr.Ax))
    dua_norm = jnp.maximum(
        jnp.maximum(norm_inf(data.q), norm_inf(pr.Aty)), norm_inf(pr.Px)
    )
    pri = pri_res / (pri_norm + OSQP_DIVISION_TOL)
    dua = dua_res / (dua_norm + OSQP_DIVISION_TOL)
    est = rho * jnp.sqrt(pri / dua)
    return jnp.clip(est, RHO_MIN, RHO_MAX)
