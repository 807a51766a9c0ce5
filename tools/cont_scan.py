"""Fingerprint scan for the CONT-* family (elliptic boundary control).

Structure is pinned by the dimensions: CONT-050 has n = 2597 =
49^2 interior states + 4*49 boundary controls and m = 2401 = 49^2
five-point-Laplacian rows on the N=50 vertex grid (interior nodes
(i/N, j/N), i,j = 1..N-1; the Dirichlet neighbor values on the domain
boundary are the CONTROL variables u, one per boundary midpoint —
corners never neighbor an interior node, matching 4(N-1) controls).

    min 0.5*h^2 * sum_ij (y_ij - y_d(x_ij))^2 + (alpha/2)*h * sum u^2
    s.t. 4 y_ij - y_neighbors = h^2 f(x_ij)   (u where the neighbor is
                                               a boundary midpoint)
         lo <= u <= hi  (and optionally bounds on y)

The QPS drops the constant 0.5*h^2*sum y_d^2 (hence the negative
published optima); candidates are solved EXACTLY via the active-set
box solver (tools/aug2d_qp_scan.py) and a candidate reproducing
CONT-050's published -4.5638509 must ALSO reproduce CONT-100's
-4.6443979 from the same formula at N=100 — a double fingerprint.

Usage: python tools/cont_scan.py [N]

Findings (round 3): the target function is identified with high
confidence as y_d = 1 + 2(x1 + x2) — it dominates every scan (best
rel ~1e-2, and it is the only candidate whose implied true objective
J = pub + 0.5 h^2 sum y_d^2 is positive, as J must be).  The published
sequence and the model sequence are BOTH of the form o_inf + c/N
(published: -4.725 + 8.05/N, fitting N=50/100/200 to 3e-4; model at
alpha=1e-3: -4.812 + 10.1/N), so the remaining gap is one O(1) dial
(alpha: root-finds give alpha*(N) -> ~0.0054 in the limit, not a
clean value) plus one O(h) quadrature/boundary convention that shifts
the 1/N coefficient by ~-2.  Scanned and ruled out: boundary-inclusive
state quadrature (overshoots 5-10x), control bounds in every plausible
band (tight bounds overshoot; loose never bind), cell-centered FV
(its discrete objective is nearly N-independent, published drifts with
N), alpha alone (alpha* drifts with N), f in {0,1,2} (negligible at
h^2 scaling).  Without the SIF the exact convention pair is not
identifiable to the <1e-5 fingerprint gate.
"""

from __future__ import annotations

import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from aug2d_qp_scan import active_set_box

PUB = {
    50: -4.5638509,
    100: -4.6443979,
    200: -4.6848759,
    300: -4.6863402,
}


def build(N, yd, f, alpha, quad="vertex"):
    """Assemble the boundary-control QP for grid parameter N.

    Returns (w, q, A, b, nu) with variables [y (interior), u (boundary
    midpoints)]; the objective is 0.5 x'diag(w)x + q'x (constant
    dropped, QPS convention).
    """
    h = 1.0 / N
    ni = N - 1  # interior nodes per axis
    ny = ni * ni
    nu = 4 * ni
    n = ny + nu
    yidx = lambda i, j: (i - 1) * ni + (j - 1)  # i,j in 1..ni

    # boundary midpoint index for the neighbor of interior node (i,j)
    # sides: 0 bottom (j=0), 1 top (j=N), 2 left (i=0), 3 right (i=N)
    def uidx(side, k):  # k in 1..ni
        return ny + side * ni + (k - 1)

    rows, cols, vals = [], [], []
    r = 0
    for i in range(1, N):
        for j in range(1, N):
            rows.append(r); cols.append(yidx(i, j)); vals.append(4.0)
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 1 <= ii <= ni and 1 <= jj <= ni:
                    rows.append(r); cols.append(yidx(ii, jj)); vals.append(-1.0)
                else:
                    if jj == 0:
                        c = uidx(0, ii)
                    elif jj == N:
                        c = uidx(1, ii)
                    elif ii == 0:
                        c = uidx(2, jj)
                    else:
                        c = uidx(3, jj)
                    rows.append(r); cols.append(c); vals.append(-1.0)
            r += 1
    A = sp.csr_matrix((vals, (rows, cols)), shape=(r, n)).tocsc()

    g = np.arange(1, N) * h
    X1, X2 = np.meshgrid(g, g, indexing="ij")
    ydv = yd(X1, X2).ravel()
    b = (h * h) * f(X1, X2).ravel()

    wy = h * h if quad == "vertex" else 1.0
    wu = alpha * h if quad == "vertex" else alpha
    w = np.concatenate([np.full(ny, wy), np.full(nu, wu)])
    q = np.concatenate([-wy * ydv, np.zeros(nu)])
    return w, q, A, b, ny, nu


def solve_candidate(N, yd, f, alpha, ulo, uhi, quad="vertex",
                    ylo=-np.inf, yhi=np.inf):
    w, q, A, b, ny, nu = build(N, yd, f, alpha, quad)
    lb = np.concatenate([np.full(ny, ylo), np.full(nu, ulo)])
    ub = np.concatenate([np.full(ny, yhi), np.full(nu, uhi)])
    if not (np.isfinite(lb).any() or np.isfinite(ub).any()):
        # unconstrained: the eq path of the same solver
        from aug2d_qp_scan import active_set_lb

        return active_set_lb(w, q, A, b, lb)[0]
    return active_set_box(w, q, A, b, lb, ub)[0]


YDS = {
    "1+2(x+y)": lambda a, c: 1 + 2 * (a + c),
    "1+2x+2y^2": lambda a, c: 1 + 2 * a + 2 * c * c,
    "3+5(x+y)": lambda a, c: 3 + 5 * (a + c),
    "2+sin(2pi x)sin(2pi y)": lambda a, c: 2 + np.sin(2 * np.pi * a) * np.sin(2 * np.pi * c),
    "sin(2pi x)sin(2pi y)": lambda a, c: np.sin(2 * np.pi * a) * np.sin(2 * np.pi * c),
    "1+x^2+y^2": lambda a, c: 1 + a * a + c * c,
    "2xy": lambda a, c: 2 * a * c,
    "x^2+y^2": lambda a, c: a * a + c * c,
}
FS = {
    "0": lambda a, c: np.zeros_like(a),
    "1": lambda a, c: np.ones_like(a),
    "2": lambda a, c: 2 * np.ones_like(a),
}


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    target = PUB[N]
    best = []
    for ydn, yd in YDS.items():
        for fn, f in FS.items():
            for alpha in (1e-2, 1e-3, 1e-4):
                for ulo, uhi in ((0.0, 10.0), (1.5, 2.5), (-2.0, 2.0),
                                 (0.0, np.inf), (-np.inf, np.inf)):
                    obj = solve_candidate(N, yd, f, alpha, ulo, uhi)
                    if obj is None:
                        continue
                    rel = abs(obj - target) / abs(target)
                    best.append((rel, ydn, fn, alpha, (ulo, uhi), obj))
                    if rel < 1e-3:
                        print(f"CAND yd={ydn} f={fn} a={alpha} "
                              f"u=[{ulo},{uhi}] obj={obj:.7e} rel={rel:.1e}",
                              flush=True)
    best.sort()
    print("top 10:")
    for rel, ydn, fn, alpha, bounds, obj in best[:10]:
        print(f"  rel={rel:.2e} yd={ydn} f={fn} a={alpha} u={bounds} "
              f"obj={obj:.7e}", flush=True)


if __name__ == "__main__":
    main()
