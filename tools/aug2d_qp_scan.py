"""Fingerprint scan for the bounded AUG2D variants (AUG2DQP/AUG2DCQP).

Hypothesis space: the verified AUG2D / AUG2DC objectives + simple
variable bounds (the SIF "QP" suffix).  Candidates are solved EXACTLY
with a primal-dual active-set method on the sparse KKT system (splu
per iteration): fix the working set at its bound, solve the reduced
equality QP, add primal violators / release dual violators, repeat
until both feasibility and the bound multiplier signs hold.  For these
grid problems the active set settles in a few iterations; the result
is exact (f64 KKT residuals ~1e-12), so reproducing the published
optimum to <1e-5 rel IS the problem.

Usage: python tools/aug2d_qp_scan.py

Findings (round 3, exhaustive bound scan; the full candidate set below
is what main() runs): no simple bound family over
the verified AUG2D/AUG2DC objectives reproduces the published bounded
optima (AUG2DQP 6.2370121e6, AUG2DCQP 6.4981348e6).  Scanned exactly:
x>=v for v in {0,-0.1,-0.25,-0.5,-1,-2,-4} (obj is monotone in v and
crosses the published values at INCONSISTENT v* — ~-1.7 for the
AUG2D base vs ~-0.98 for the AUG2DC base, neither clean), interior-only
x>=0, boundary-only x>=0, and the all-edges-weighted alternative
objective (ruled out independently: its FREE optimum is 1.8280e6, not
AUG2D's published 1.6874118e6, so the verified zero-weight-boundary
encoding is the unique one).  Conclusion: the SIF "QP" variants also
modify the divergence right-hand side (not recoverable without the
file), so AUG2DQP/AUG2DCQP stay in the unavailable list.
"""

from __future__ import annotations

import sys

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import maros_sif as ms

PUB = {
    "AUG2DQP": 6.2370121e06,
    "AUG2DCQP": 6.4981348e06,
}


def active_set_lb(w, q, A, b, lb, const=0.0, max_rounds=200, sigma=1e-8):
    """min 0.5 x'Wx + q'x + const  s.t.  Ax=b, x >= lb (lb=-inf: free).

    Primal-dual active-set: working set S fixed at lb; reduced KKT
    solved via splu with tiny regularization + iterative refinement.
    Returns (obj, x, rounds) or (None, None, rounds) on non-convergence.
    """
    n = len(w)
    m = len(b)
    bounded = np.isfinite(lb)
    S = np.zeros(n, bool)  # active (fixed at lb)
    In = sp.eye(n, format="csc")
    for rounds in range(1, max_rounds + 1):
        d = w + sigma + S * 1e12  # penalty-fix active vars (huge diag)
        K = sp.bmat([[sp.diags(d), A.T], [A, -sigma * sp.eye(m)]],
                    format="csc")
        lu = spla.splu(K)
        xfix = np.where(S, lb, 0.0)
        rhs = np.concatenate([-q + 1e12 * xfix * S, b])
        sol = lu.solve(rhs)
        x = sol[:n]
        lam = sol[n:]
        # refinement vs the exactly-fixed system: enforce x_S = lb
        for _ in range(3):
            r1 = -(w * x + q + A.T @ lam) - 1e12 * S * (x - xfix)
            r2 = b - A @ x
            dlt = lu.solve(np.concatenate([r1, r2]))
            x = x + dlt[:n]
            lam = lam + dlt[n:]
        x = np.where(S, lb, x)
        # bound multiplier on the active set: z = Wx + q + A'lam
        z = w * x + q + A.T @ lam
        viol_p = bounded & ~S & (x < lb - 1e-9)
        viol_d = S & (z < -1e-7)
        if not viol_p.any() and not viol_d.any():
            obj = 0.5 * float(np.sum(w * x * x)) + float(q @ x) + const
            return obj, x, rounds
        S = (S | viol_p) & ~viol_d
    return None, None, max_rounds


def active_set_box(w, q, A, b, lb, ub, const=0.0, max_rounds=200,
                   sigma=1e-8):
    """min 0.5 x'Wx + q'x + const  s.t.  Ax=b, lb <= x <= ub.

    Two-sided working-set variant of :func:`active_set_lb`."""
    n = len(w)
    m = len(b)
    lo_b = np.isfinite(lb)
    up_b = np.isfinite(ub)
    SL = np.zeros(n, bool)
    SU = np.zeros(n, bool)
    for rounds in range(1, max_rounds + 1):
        S = SL | SU
        xfix = np.where(SL, lb, 0.0) + np.where(SU, ub, 0.0)
        d = w + sigma + S * 1e12
        K = sp.bmat([[sp.diags(d), A.T], [A, -sigma * sp.eye(m)]],
                    format="csc")
        lu = spla.splu(K)
        sol = lu.solve(np.concatenate([-q + 1e12 * xfix, b]))
        x = sol[:n]
        lam = sol[n:]
        for _ in range(3):
            r1 = -(w * x + q + A.T @ lam) - 1e12 * S * (x - xfix)
            r2 = b - A @ x
            dlt = lu.solve(np.concatenate([r1, r2]))
            x = x + dlt[:n]
            lam = lam + dlt[n:]
        x = np.where(S, xfix, x)
        z = w * x + q + A.T @ lam
        viol = ((lo_b & ~S & (x < lb - 1e-9))
                | (up_b & ~S & (x > ub + 1e-9))
                | (SL & (z < -1e-7)) | (SU & (z > 1e-7)))
        if not viol.any():
            obj = 0.5 * float(np.sum(w * x * x)) + float(q @ x) + const
            return obj, x, rounds
        SL = (SL & (z >= -1e-7)) | (lo_b & ~S & (x < lb - 1e-9))
        SU = (SU & (z <= 1e-7)) | (up_b & ~S & (x > ub + 1e-9))
    return None, None, max_rounds


def main():
    cands = []
    for base_name, base in (("AUG2D", ms.aug2d()), ("AUG2DC", ms.aug2dc())):
        P = base["P"]
        Pfull = P + sp.triu(P, 1).T
        w = np.asarray(Pfull.diagonal())
        A = sp.csc_matrix(base["A"])
        b = np.asarray(base["l"])
        q = np.asarray(base["q"])
        const = base["obj_const"]
        # Uniform lower-bound sweep (obj is monotone in the level; the
        # recorded round-3 crossings sit at non-structural v*).
        for lbval in (0.0, -0.1, -0.25, -0.5, -1.0, -2.0, -4.0):
            cands.append((f"{base_name} + x>={lbval}",
                          w, q, A, b, np.full(len(w), lbval), const))
        # Subset variants: bound only the interior (positive objective
        # weight) or only the zero-weight boundary-edge variables.
        interior_lb = np.where(w > 0, 0.0, -np.inf)
        boundary_lb = np.where(w == 0, 0.0, -np.inf)
        cands.append((f"{base_name} + interior x>=0",
                      w, q, A, b, interior_lb, const))
        cands.append((f"{base_name} + boundary x>=0",
                      w, q, A, b, boundary_lb, const))
        # Two-sided box 0<=x<=1 (SIF QP-suffix convention candidate),
        # via the box working-set variant.
        cands.append((f"{base_name} + 0<=x<=1 (box)",
                      w, q, A, b, ("box", np.zeros(len(w)),
                                   np.ones(len(w))), const))
    for name, w, q, A, b, lb, const in cands:
        if isinstance(lb, tuple) and lb[0] == "box":
            obj, x, rounds = active_set_box(w, q, A, b, lb[1], lb[2], const)
        else:
            obj, x, rounds = active_set_lb(w, q, A, b, lb, const)
        if obj is None:
            print(f"{name:<24} NO CONVERGENCE in {rounds}", flush=True)
            continue
        best = min(PUB, key=lambda k: abs(obj - PUB[k]))
        rel = abs(obj - PUB[best]) / PUB[best]
        flag = " <== MATCH" if rel < 1e-5 else ""
        print(f"{name:<24} obj={obj:.7e} rounds={rounds} "
              f"closest={best} rel={rel:.1e}{flag}", flush=True)


if __name__ == "__main__":
    main()
