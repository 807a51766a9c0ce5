"""Polish guess-rule lab for the problems where BOTH the reference
algorithm's polish and ours fail (PARITY_REF.json / MAROS_r04_F64.json:
CVXQP2_M/3_S/3_M, CVXQP*_L, LISWET*, YAO).

Separates the two failure hypotheses:

1. BAD GUESS — the reference's sign rule ``z - l < -y`` / ``u - z < y``
   (polish.c:33-49) mislabels rows at an eps=1e-3 ADMM point on
   degenerate problems;
2. BAD SOLVE/ACCEPT — the reduced-KKT solve or the residuals-improve
   acceptance test (polish.c:301-314) fails even with a perfect set.

by running the EXACT host-side reduced-KKT polish (tools/ref_osqp.py,
f64 scipy splu) with:

  ref       the reference rule at the ADMM point (pass 0 baseline)
  multi[k]  re-guess at the polished point, k passes, keep best
            (what osqp_tpu.polish does, polish.py:287-362)
  dist[th]  sign rule OR'd with absolute slack distance < th
  true      the rule evaluated at a high-accuracy ADMM point
            (eps=1e-8, max_iter=200k) = the oracle active set

Usage: python tools/polish_lab.py [CVXQP3_S YAO LISWET1 ...]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import maros_sif as ms
from ref_osqp import polish_with_set, ref_solve


def get_problem(name):
    if name.startswith("CVXQP"):
        variant = int(name[5])
        size = {"S": 100, "M": 1000, "L": 10000}[name.split("_")[1]]
        prob = ms.cvxqp(variant, size, name)
    elif name.startswith("LISWET"):
        prob = ms.liswet(int(name[6:]))
    elif name == "YAO":
        prob = ms.yao()
    elif name == "POWELL20":
        prob = ms.powell20()
    elif name == "DTOC3":
        prob = ms.dtoc3()
    else:
        raise SystemExit(f"no builder wired for {name}")
    A, l, u = ms.to_osqp_form(prob)
    return prob["P"], prob["q"], A, l, u


def guesses_from_point(z, l, u, y, th=0.0):
    lower = (z - l) < np.maximum(-y, 0.0) + th if th else (z - l) < -y
    upper = (u - z) < np.maximum(y, 0.0) + th if th else (u - z) < y
    # both-active would imply u < l; keep them disjoint like form_Ared
    upper = upper & ~lower
    return lower, upper


def polish_keepbest(ws, lower, upper, refine_iter=3, delta=1e-6):
    """Reduced-KKT polish that keeps the best refinement step (incl.
    step 0) by true-residual score — the candidate fix for degenerate
    active sets where the unregularized refinement target is singular."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    P, A, q, l, u = ws["Ps"], ws["As"], ws["qs"], ws["ls"], ws["us"]
    cinv, Dinv, Einv = ws["cinv"], ws["Dinv"], ws["Einv"]
    n, m = P.shape[0], A.shape[0]
    act = lower | upper
    k = int(act.sum())
    Ared = A[act]
    rhs_red = np.where(lower, l, np.where(upper, u, 0.0))[act]
    K = sp.bmat([[P + delta * sp.eye(n), Ared.T],
                 [Ared, -delta * sp.eye(k) if k else None]], format="csc")
    try:
        lu = spla.splu(K)
    except RuntimeError:
        return None
    b = np.concatenate([-q, rhs_red])
    K0 = sp.bmat([[P, Ared.T],
                  [Ared, sp.csc_matrix((k, k)) if k else None]], format="csc")

    def eval_point(sol):
        x_p = sol[:n]
        y_p = np.zeros(m)
        y_p[act] = sol[n:]
        z_p = A @ x_p
        zy = z_p + y_p
        z_p = np.clip(zy, l, u)
        y_p = zy - z_p
        pri = np.linalg.norm(Einv * (A @ x_p - z_p), np.inf) if m else 0.0
        dua = cinv * np.linalg.norm(Dinv * (P @ x_p + q + A.T @ y_p), np.inf)
        return x_p, z_p, y_p, pri, dua

    sol = lu.solve(b)
    if not np.all(np.isfinite(sol)):
        return None
    best = eval_point(sol)
    for _ in range(refine_iter):
        sol = sol + lu.solve(b - K0 @ sol)
        if not np.all(np.isfinite(sol)):
            break
        cand = eval_point(sol)
        if max(cand[3], cand[4]) < max(best[3], best[4]):
            best = cand
    return best


def try_set(ws, lower, upper, label, results, refine_iter=3):
    ok, xp, zp, yp, pri, dua = polish_with_set(
        ws["Ps"], ws["As"], ws["qs"], ws["ls"], ws["us"],
        lower, upper, ws["cinv"], ws["Dinv"], ws["Einv"],
        refine_iter=refine_iter,
    )
    accept = ok and pri < ws["pri_res"] and dua < ws["dua_res"]
    results.append((label, int((lower | upper).sum()), ok, accept, pri, dua))
    return ok, xp, zp, yp, pri, dua


def run(name):
    P, q, A, l, u = get_problem(name)
    ws = ref_solve(P, q, A, l, u, do_polish=False, interval="fixed",
                   max_iter=40000, return_workspace=True)
    print(f"\n== {name}: admm iter={ws['iter']} status={ws['status']} "
          f"pri={ws['pri_res']:.3e} dua={ws['dua_res']:.3e}")
    if ws["status"] != "solved":
        print("  not solved; skipping")
        return

    z, ls, us, y = ws["zs"], ws["ls"], ws["us"], ws["ys"]
    results = []

    # 1. reference rule (pass 0)
    lo, up = guesses_from_point(z, ls, us, y)
    ok, xp, zp, yp, pri, dua = try_set(ws, lo, up, "ref", results)

    # 2. multi-pass re-guessing (our polish_passes=4 behaviour)
    cz, cy = (zp, yp) if ok else (z, y)
    for p in range(1, 4):
        lo, up = guesses_from_point(cz, ls, us, cy)
        ok, xp, zp, yp, pri, dua = try_set(ws, lo, up, f"multi[{p}]", results)
        if not ok:
            break
        cz, cy = zp, yp

    # 3. distance-augmented rules at the ADMM point
    scale = max(np.max(np.abs(z)), 1.0)
    for th in (1e-6, 1e-5, 1e-4, 1e-3):
        lo, up = guesses_from_point(z, ls, us, y, th=th * scale)
        try_set(ws, lo, up, f"dist[{th:g}]", results)

    # 3b. no-refinement variants: if Ared is rank-deficient the
    # unregularized K0 refinement target is singular and refinement
    # DIVERGES; the delta-regularized step-0 solution alone has
    # O(delta)-level true residuals when the set is right.
    lo, up = guesses_from_point(z, ls, us, y)
    ok, xp, zp, yp, pri, dua = try_set(ws, lo, up, "ref+r0", results,
                                       refine_iter=0)
    cz, cy = (zp, yp) if ok else (z, y)
    for p in range(1, 4):
        lo, up = guesses_from_point(cz, ls, us, cy)
        ok, xp, zp, yp, pri, dua = try_set(ws, lo, up, f"multi[{p}]+r0",
                                           results, refine_iter=0)
        if not ok:
            break
        cz, cy = zp, yp

    # 3c. keep-best refinement + multi-pass re-guessing from the BEST
    # point of each pass (the production-candidate combination)
    cz, cy = z, y
    for p in range(4):
        lo, up = guesses_from_point(cz, ls, us, cy)
        out = polish_keepbest(ws, lo, up)
        if out is None:
            break
        xp, zp, yp, pri, dua = out
        accept = pri < ws["pri_res"] and dua < ws["dua_res"]
        results.append((f"kb[{p}]", int((lo | up).sum()), True, accept,
                        pri, dua))
        cz, cy = zp, yp

    # 4. oracle: rule at a high-accuracy point
    ws9 = ref_solve(P, q, A, l, u, do_polish=False, interval="fixed",
                    eps_abs=1e-8, eps_rel=1e-8, max_iter=200000,
                    return_workspace=True)
    if ws9["status"] == "solved":
        lo, up = guesses_from_point(ws9["zs"], ls, us, ws9["ys"])
        try_set(ws, lo, up, f"true(iter={ws9['iter']})", results)
        try_set(ws, lo, up, f"true+r0", results, refine_iter=0)

    for label, k, ok, accept, pri, dua in results:
        print(f"  {label:<16} |act|={k:<6} ok={int(ok)} accept={int(accept)} "
              f"pri={pri:.3e} dua={dua:.3e}")


if __name__ == "__main__":
    names = sys.argv[1:] or ["CVXQP3_S", "CVXQP2_M", "YAO"]
    for nm in names:
        run(nm)
