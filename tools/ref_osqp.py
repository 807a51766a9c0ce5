"""Host-side f64 re-implementation of the reference OSQP 0.6.2 algorithm.

Purpose: a *parity oracle*.  The reference publishes no per-problem
iteration counts, so to judge whether osqp_tpu's iteration behaviour
matches the reference algorithm (VERDICT round-3, Missing #2) we need the
exact reference loop runnable on the regenerated Maros-Meszaros corpus.
This is scipy + numpy only — no JAX — and follows the C sources
step-for-step:

* Ruiz scaling + cost scalar ......... /root/reference/src/scaling.c:44-156
* rho-vector classification .......... src/auxil.c:76-98
* KKT [P+sI, A'; A, -diag(1/rho)] .... src/kkt.c:6-177, factored with
  scipy.sparse.linalg.splu (plays QDLDL's role; same math)
* ADMM steps + z-tilde recovery ...... src/auxil.c:161-225,
  lin_sys/direct/qdldl/qdldl_interface.c:359-370
* residuals / tolerances / status .... src/auxil.c:240-359, 681-786
* adaptive rho ....................... src/auxil.c:13-74; interval logic
  src/osqp.c:456-529 — both the PROFILING time-fraction rule (default
  build: interval fixes once solve wall-time exceeds
  adaptive_rho_fraction x setup time, rounded to check_termination) and
  the deterministic 4 x check_termination fallback are implemented;
  choose with interval="time" | "fixed" | int.
* polish ............................. src/polish.c:19-350 (true reduced
  KKT with dynamic shapes, delta regularization, 3 refinement steps,
  normal-cone projection, acceptance test)

This file is an analysis TOOL (used by tools/parity_study.py and the
polish root-cause work); the production solver lives in osqp_tpu/.
"""

from __future__ import annotations

import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

OSQP_INFTY = 1e30
DIVISION_TOL = 1.0 / OSQP_INFTY
MIN_SCALING = 1e-4
MAX_SCALING = 1e4
RHO_MIN = 1e-6
RHO_MAX = 1e6
RHO_TOL = 1e-4
RHO_EQ_OVER_RHO_INEQ = 1e3


def _limit_scaling(d):
    d = np.where(d < MIN_SCALING, 1.0, d)
    return np.minimum(d, MAX_SCALING)


def ruiz_scale(P, A, q, l, u, n_iter=10):
    """scaling.c:44-156.  Returns scaled copies + (c, D, E)."""
    n = P.shape[0]
    m = A.shape[0]
    c = 1.0
    D = np.ones(n)
    E = np.ones(m)
    P = P.copy().tocsc()
    A = A.copy().tocsc()
    q = q.copy()
    for _ in range(n_iter):
        # column inf-norms of the KKT (compute_inf_norm_cols_KKT)
        Pc = np.asarray(abs(P).max(axis=0).todense()).ravel() if P.nnz else np.zeros(n)
        Ac = np.asarray(abs(A).max(axis=0).todense()).ravel() if A.nnz else np.zeros(n)
        d = _limit_scaling(np.maximum(Pc, Ac))
        e = (
            _limit_scaling(np.asarray(abs(A).max(axis=1).todense()).ravel())
            if A.nnz
            else np.ones(m)
        )
        d = 1.0 / np.sqrt(d)
        e = 1.0 / np.sqrt(e)
        dM = sp.diags(d)
        eM = sp.diags(e)
        P = (dM @ P @ dM).tocsc()
        A = (eM @ A @ dM).tocsc()
        q = d * q
        D *= d
        E *= e
        # cost normalization step
        Pcols = (
            np.asarray(abs(P).max(axis=0).todense()).ravel() if P.nnz else np.zeros(n)
        )
        c_temp = max(np.mean(Pcols), _limit_scaling(np.array([np.linalg.norm(q, np.inf)]))[0])
        c_temp = _limit_scaling(np.array([c_temp]))[0]
        c_temp = 1.0 / c_temp
        P = P * c_temp
        q = q * c_temp
        c *= c_temp
    lo = E * l
    up = E * u
    return P, A, q, lo, up, c, D, E


def set_rho_vec(l, u, rho):
    """auxil.c:76-98."""
    rho = min(max(rho, RHO_MIN), RHO_MAX)
    loose = (l < -OSQP_INFTY * MIN_SCALING) & (u > OSQP_INFTY * MIN_SCALING)
    eq = (u - l) < RHO_TOL
    rho_vec = np.where(loose, RHO_MIN, np.where(eq, RHO_EQ_OVER_RHO_INEQ * rho, rho))
    return rho, rho_vec


def factor_kkt(P, A, sigma, rho_vec):
    n = P.shape[0]
    m = A.shape[0]
    K = sp.bmat(
        [
            [P + sigma * sp.eye(n), A.T],
            [A, -sp.diags(1.0 / rho_vec) if m else None],
        ],
        format="csc",
    )
    return spla.splu(K)


def polish(P, A, q, l, u, x, z, y, cinv, Dinv, Einv, delta=1e-6, refine_iter=3):
    """polish.c:19-350 with true dynamic-shape reduced KKT.

    Returns (success, x, z, y, pri_res, dua_res) in SCALED space with
    UNSCALED residual norms (update_info(..., polish=1) semantics)."""
    lower = (z - l) < -y
    upper = (u - z) < y
    return polish_with_set(
        P, A, q, l, u, lower, upper, cinv, Dinv, Einv, delta, refine_iter
    )


def polish_with_set(
    P, A, q, l, u, lower, upper, cinv, Dinv, Einv, delta=1e-6, refine_iter=3
):
    """The reduced-KKT solve of polish.c:105-350 for a GIVEN active-set
    guess (lower/upper boolean row masks) — lets experiments swap the
    guess rule (polish.c:33-49) while keeping the solve identical."""
    n = P.shape[0]
    m = A.shape[0]
    act = lower | upper
    k = int(act.sum())
    Ared = A[act]
    rhs_red = np.where(lower, l, np.where(upper, u, 0.0))[act]
    K = sp.bmat(
        [
            [P + delta * sp.eye(n), Ared.T],
            [Ared, -delta * sp.eye(k) if k else None],
        ],
        format="csc",
    )
    try:
        lu = spla.splu(K)
    except RuntimeError:
        return False, None, None, None, np.inf, np.inf
    b = np.concatenate([-q, rhs_red])
    sol = lu.solve(b)
    K0 = sp.bmat(
        [[P, Ared.T], [Ared, sp.csc_matrix((k, k)) if k else None]], format="csc"
    )
    for _ in range(refine_iter):
        sol = sol + lu.solve(b - K0 @ sol)
    x_pol = sol[:n]
    y_pol = np.zeros(m)
    y_pol[act] = sol[n:]
    z_pol = A @ x_pol
    zy = z_pol + y_pol
    z_pol = np.clip(zy, l, u)
    y_pol = zy - z_pol
    pri = np.linalg.norm(Einv * (A @ x_pol - z_pol), np.inf) if m else 0.0
    dua = cinv * np.linalg.norm(Dinv * (P @ x_pol + q + A.T @ y_pol), np.inf)
    return True, x_pol, z_pol, y_pol, pri, dua


def ref_solve(
    P,
    q,
    A,
    l,
    u,
    eps_abs=1e-3,
    eps_rel=1e-3,
    eps_prim_inf=1e-4,
    eps_dual_inf=1e-4,
    rho=0.1,
    sigma=1e-6,
    alpha=1.6,
    max_iter=4000,
    check_termination=25,
    scaling=10,
    adaptive_rho=True,
    adaptive_rho_tolerance=5.0,
    adaptive_rho_fraction=0.4,
    interval="time",
    do_polish=True,
    delta=1e-6,
    polish_refine_iter=3,
    return_workspace=False,
):
    """Reference osqp_solve (osqp.c:288-654) at f64.

    ``interval``: "time" reproduces the PROFILING auto-interval
    (osqp.c:456-485) with real wall times; "fixed" the deterministic
    4 x check_termination fallback; an int pins it."""
    t_setup0 = time.perf_counter()
    P = sp.csc_matrix(P, dtype=np.float64)
    # Accept the OSQP upper-triangular convention (validate_data,
    # auxil.c:846-855) or a full symmetric matrix; work on full P.
    if (abs(P - P.T) > 0).nnz:
        P = (sp.triu(P) + sp.triu(P, 1).T).tocsc()
    A = sp.csc_matrix(A, dtype=np.float64)
    q = np.asarray(q, np.float64)
    l = np.asarray(l, np.float64)
    u = np.asarray(u, np.float64)
    n = P.shape[0]
    m = A.shape[0]

    if scaling:
        Ps, As, qs, ls, us, c, D, E = ruiz_scale(P, A, q, l, u, scaling)
    else:
        Ps, As, qs, ls, us = P, A, q, l, u
        c, D, E = 1.0, np.ones(n), np.ones(m)
    cinv, Dinv, Einv = 1.0 / c, 1.0 / D, 1.0 / E

    rho, rho_vec = set_rho_vec(ls, us, rho)
    rho_inv = 1.0 / rho_vec
    lu = factor_kkt(Ps, As, sigma, rho_vec)
    setup_time = time.perf_counter() - t_setup0

    x = np.zeros(n)
    z = np.zeros(m)
    y = np.zeros(m)
    rho_updates = 0
    status = "max_iter"
    pri_res = dua_res = np.inf
    Ax = np.zeros(m)
    Px = np.zeros(n)
    Aty = np.zeros(n)

    if interval == "fixed":
        rho_interval = 4 * check_termination
    elif interval == "time":
        rho_interval = 0  # auto: set when time condition met
    else:
        rho_interval = int(interval)

    def residuals(x, z, y):
        Ax = A_s @ x if m else np.zeros(0)
        Px = P_s @ x
        Aty = A_s.T @ y if m else np.zeros(n)
        pri = np.linalg.norm(Einv * (Ax - z), np.inf) if m else 0.0
        dua = cinv * np.linalg.norm(Dinv * (Px + qs + Aty), np.inf)
        return pri, dua, Ax, Px, Aty

    A_s, P_s = As, Ps
    t_solve0 = time.perf_counter()
    it = 0
    can_check = False
    for it in range(1, max_iter + 1):
        x_prev, z_prev = x, z
        # update_xz_tilde (auxil.c:161-183 + qdldl z recovery)
        rhs = np.concatenate([sigma * x_prev - qs, z_prev - rho_inv * y])
        sol = lu.solve(rhs)
        xt = sol[:n]
        nu = sol[n:]
        zt = z_prev + rho_inv * (nu - y)  # qdldl_interface.c:359-370
        # update_x / update_z / update_y
        x = alpha * xt + (1 - alpha) * x_prev
        z = np.clip(alpha * zt + (1 - alpha) * z_prev + rho_inv * y, ls, us)
        dy = rho_vec * (alpha * zt + (1 - alpha) * z_prev - z)
        y = y + dy
        dx = x - x_prev

        can_check = check_termination and (it % check_termination == 0)
        if can_check:
            pri_res, dua_res, Ax, Px, Aty = residuals(x, z, y)
            eps_pri = eps_abs + eps_rel * max(
                np.linalg.norm(Einv * z, np.inf) if m else 0.0,
                np.linalg.norm(Einv * Ax, np.inf) if m else 0.0,
            )
            eps_dua = eps_abs + eps_rel * cinv * max(
                np.linalg.norm(Dinv * qs, np.inf),
                np.linalg.norm(Dinv * Aty, np.inf),
                np.linalg.norm(Dinv * Px, np.inf),
            )
            prim_ok = (m == 0) or (pri_res < eps_pri)
            dual_ok = dua_res < eps_dua
            if prim_ok and dual_ok:
                status = "solved"
                break
            # primal infeasibility (auxil.c:361-424)
            if m and not prim_ok:
                dyn = np.linalg.norm(E * dy, np.inf)
                if dyn > eps_prim_inf:
                    dyv = dy / dyn
                    bound = us @ np.maximum(dyv, 0) + ls @ np.minimum(dyv, 0)
                    if bound < -eps_prim_inf:
                        if np.linalg.norm(Dinv * (A_s.T @ dyv), np.inf) < eps_prim_inf:
                            status = "primal infeasible"
                            break
            # dual infeasibility (auxil.c:426-512)
            if not dual_ok:
                dxn = np.linalg.norm(D * dx, np.inf)
                if dxn > eps_dual_inf:
                    dxv = dx / dxn
                    if qs @ dxv < -eps_dual_inf:
                        if np.linalg.norm(Dinv * (P_s @ dxv), np.inf) < eps_dual_inf:
                            Adx = Einv * (A_s @ dxv)
                            up_ok = np.all(
                                (Adx < eps_dual_inf) | (us > OSQP_INFTY * MIN_SCALING)
                            )
                            lo_ok = np.all(
                                (Adx > -eps_dual_inf) | (ls < -OSQP_INFTY * MIN_SCALING)
                            )
                            if up_ok and lo_ok:
                                status = "dual infeasible"
                                break

        # adaptive rho interval selection (osqp.c:456-485)
        if adaptive_rho and rho_interval == 0:
            if time.perf_counter() - t_solve0 > adaptive_rho_fraction * setup_time:
                ct = check_termination if check_termination else 25
                rho_interval = max(int(round(it / ct)) * ct, ct)
        if adaptive_rho and rho_interval and (it % rho_interval == 0):
            if not can_check:
                pri_res, dua_res, Ax, Px, Aty = residuals(x, z, y)
            # compute_rho_estimate (auxil.c:13-52)
            pnorm = max(
                np.linalg.norm(z, np.inf) if m else 0.0,
                np.linalg.norm(Ax, np.inf) if m else 0.0,
            )
            dnorm = max(
                np.linalg.norm(qs, np.inf),
                np.linalg.norm(Aty, np.inf),
                np.linalg.norm(Px, np.inf),
            )
            # NB: compute_rho_estimate uses SCALED residuals (plain
            # vec_norm_inf on the residual work vectors, auxil.c:26-27)
            pri_sc = np.linalg.norm(Ax - z, np.inf) if m else 0.0
            dua_sc = np.linalg.norm(Px + qs + Aty, np.inf)
            pr = pri_sc / (pnorm + DIVISION_TOL)
            dr = dua_sc / (dnorm + DIVISION_TOL)
            rho_est = rho * np.sqrt(pr / (dr + DIVISION_TOL))
            rho_est = min(max(rho_est, RHO_MIN), RHO_MAX)
            if (
                rho_est > rho * adaptive_rho_tolerance
                or rho_est < rho / adaptive_rho_tolerance
            ):
                rho, rho_vec = set_rho_vec(ls, us, rho_est)
                rho_inv = 1.0 / rho_vec
                lu = factor_kkt(P_s, A_s, sigma, rho_vec)
                rho_updates += 1

    if not can_check:
        pri_res, dua_res, Ax, Px, Aty = residuals(x, z, y)

    status_polish = 0
    if do_polish and status == "solved":
        ok, xp, zp, yp, prp, drp = polish(
            P_s, A_s, qs, ls, us, x, z, y, cinv, Dinv, Einv, delta, polish_refine_iter
        )
        accept = ok and (
            (prp < pri_res and drp < dua_res)
            or (prp < pri_res and dua_res < 1e-10)
            or (drp < dua_res and pri_res < 1e-10)
        )
        if accept:
            x, z, y = xp, zp, yp
            pri_res, dua_res = prp, drp
            status_polish = 1
        else:
            status_polish = -1

    obj = cinv * (0.5 * x @ (P_s @ x) + qs @ x)
    if return_workspace:
        # Scaled data + scaled terminal iterates, for polish experiments
        # (tools/polish_lab.py) that re-run the reduced-KKT solve with
        # alternative active-set guesses.
        return dict(
            status=status,
            iter=it,
            status_polish=status_polish,
            pri_res=pri_res,
            dua_res=dua_res,
            Ps=P_s, As=A_s, qs=qs, ls=ls, us=us,
            xs=x, zs=z, ys=y,
            cinv=cinv, Dinv=Dinv, Einv=Einv,
        )
    return dict(
        status=status,
        iter=it,
        obj=obj,
        pri_res=pri_res,
        dua_res=dua_res,
        rho_updates=rho_updates,
        rho_final=rho,
        status_polish=status_polish,
        x=D * x,
        y=cinv * E * y,
        z=Einv * z,
        setup_time=setup_time,
        solve_time=time.perf_counter() - t_solve0,
    )
