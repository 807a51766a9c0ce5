"""Host-side exact polish for single-instance sparse solves.

The reference's polish is a one-time DIRECT factorization of the
reduced KKT (polish.c:212-350: fresh LDL at delta = 1e-6).  On the
device, the never-densifying sparse path must solve that system with
matrix-free CG — and on hard problems (DTOC3's masked Schur needs
~24-40k Jacobi-CG iterations) the one fused final dispatch becomes a
multi-minute device program that the TPU worker's watchdog kills
(round-4 AUG2D incident).  Polish is setup-class work, not hot-loop
work, so for B = 1 sparse solves it runs HERE: an exact scipy splu of
the true dynamic-shape reduced KKT in f64 — the same division of labor
as problem ingestion (host scipy -> device ELL).

Math follows src/polish.c exactly (active-set guess, reduced KKT with
delta regularization, ``polish_refine_iter`` refinement steps against
the unregularized system, normal-cone projection, accept iff both
residuals improve), plus the package's multi-pass re-guess loop
(polish.polish): the set is re-guessed at the polished point up to
``passes`` times and the best pass kept — pass 0 is the reference
behaviour.

Works on UNSCALED data: polishing the unscaled problem is the same
algorithm (the reference polishes scaled data only because its
workspace is scaled), and the acceptance test compares unscaled
residual norms, which is what the solve results carry.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def _reduced_kkt_polish(P, A, q, l, u, x, z, y, delta, refine_iter):
    """One polish pass (polish.c:19-350) with true dynamic shapes.

    All inputs unscaled f64; P full symmetric CSC.  Returns
    (x, z, y, pri_res, dua_res) or None on a singular reduced KKT."""
    n = P.shape[0]
    m = A.shape[0]
    lower = (z - l) < -y
    upper = (u - z) < y
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
        return None
    b = np.concatenate([-q, rhs_red])
    sol = lu.solve(b)
    if not np.all(np.isfinite(sol)):
        return None
    K0 = sp.bmat(
        [[P, Ared.T], [Ared, sp.csc_matrix((k, k)) if k else None]],
        format="csc",
    )

    def eval_point(sol):
        x_p = sol[:n]
        y_p = np.zeros(m)
        y_p[act] = sol[n:]
        z_p = A @ x_p
        zy = z_p + y_p
        z_p = np.clip(zy, l, u)
        y_p = zy - z_p
        pri = float(np.linalg.norm(A @ x_p - z_p, np.inf)) if m else 0.0
        dua = float(np.linalg.norm(P @ x_p + q + A.T @ y_p, np.inf))
        return x_p, z_p, y_p, pri, dua

    # Keep the best refinement step INCLUDING step 0: the refinement
    # target K0 drops the delta regularization (polish.c:161-177), and
    # when the guessed Ared has dependent rows (degenerate actives —
    # the CVXQP/LISWET classes) K0 is singular and refinement DIVERGES,
    # while the delta-regularized step-0 solution already has
    # O(delta)-level true residuals.  Measured on CVXQP2_M: step 3
    # dua = 6.3e+2, step 0 of the re-guessed pass dua = 1.6e-2
    # (accepted); see tools/polish_lab.py.
    best = eval_point(sol)
    for _ in range(refine_iter):
        if not np.all(np.isfinite(sol)):
            break
        sol = sol + lu.solve(b - K0 @ sol)
        cand = eval_point(sol)
        if np.isfinite(max(cand[3], cand[4])) and max(cand[3], cand[4]) < max(
            best[3], best[4]
        ):
            best = cand
    return best


def polish_host(
    P,
    A,
    q,
    l,
    u,
    x,
    y,
    admm_pri_res: float,
    admm_dua_res: float,
    delta: float = 1e-6,
    refine_iter: int = 3,
    passes: int = 4,
):
    """Exact multi-pass polish of one UNSCALED solution.

    ``P``/``A`` scipy sparse (P upper-triangular or full symmetric);
    ``x``/``y`` the solver's unscaled solution.  Returns
    (success, x, y, obj, pri_res, dua_res); on failure the inputs and
    the ADMM residuals come back unchanged (graceful degradation,
    polish.c:334-339)."""
    P = sp.csc_matrix(P, dtype=np.float64)
    if (abs(P - P.T) > 0).nnz:
        P = (sp.triu(P) + sp.triu(P, 1).T).tocsc()
    A = sp.csc_matrix(A, dtype=np.float64)
    q = np.asarray(q, np.float64).ravel()
    l = np.asarray(l, np.float64).ravel()
    u = np.asarray(u, np.float64).ravel()
    x = np.asarray(x, np.float64).ravel()
    y = np.asarray(y, np.float64).ravel()
    # The driver's results don't carry the ADMM z; at a solved point
    # the projection of Ax reproduces it to within pri_res, and the
    # multi-pass re-guess self-corrects residual misclassification.
    z = np.clip(A @ x, l, u)

    best = None  # (score, x, y, pri, dua)
    cx, cz, cy = x, z, y
    for _ in range(max(1, int(passes))):
        out = _reduced_kkt_polish(
            P, A, q, l, u, cx, cz, cy, float(delta), int(refine_iter)
        )
        if out is None:
            break
        x_p, z_p, y_p, pri, dua = out
        score = max(pri, dua)
        if np.isfinite(score) and (best is None or score < best[0]):
            best = (score, x_p, y_p, pri, dua)
        cx, cz, cy = x_p, z_p, y_p

    if best is None:
        return False, x, y, None, admm_pri_res, admm_dua_res
    _, x_p, y_p, pri, dua = best
    # Acceptance (polish.c:301-314)
    ok = (
        (pri < admm_pri_res and dua < admm_dua_res)
        or (pri < admm_pri_res and admm_dua_res < 1e-10)
        or (dua < admm_dua_res and admm_pri_res < 1e-10)
    )
    if not ok:
        return False, x, y, None, admm_pri_res, admm_dua_res
    obj = float(0.5 * x_p @ (P @ x_p) + q @ x_p)
    return True, x_p, y_p, obj, pri, dua
