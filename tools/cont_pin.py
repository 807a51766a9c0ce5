"""Pin the CONT-050/100/200 convention by root-finding alpha per
quadrature hypothesis and double-fingerprinting across grid sizes.

Round-3 state (tools/cont_scan.py): target y_d = 1 + 2(x1+x2) pinned;
published sequence ~ -4.725 + 8.05/N; base model (wy=h^2, wu=alpha*h,
no boundary tracking) gives a drifting alpha*(N) -> ~0.0054, i.e. one
O(1) dial plus one O(h) convention short.

New hypothesis tested here: with DIRICHLET boundary control, y = u on
the boundary, so a trapezoid-rule tracking integral over the closed
domain includes the boundary vertices where the state IS the control:

    J = 0.5 h^2 sum_int (y - yd)^2
      + 0.5 wb_fac h^2 sum_bnd (u - yd_b)^2      (wb_fac = 1/2: trapezoid)
      + (alpha/2) uq(h) sum u^2

This adds exactly an O(h) term to the objective (4(N-1) boundary terms
at weight h^2 ~ h * h^2/h), the size of the unexplained 1/N shift.

For each (wb_fac, uq) convention the scalar alpha is root-found so the
model reproduces CONT-050's published -4.5638509 EXACTLY, then the SAME
(convention, alpha) is evaluated at N=100 vs CONT-100's -4.6443979 —
a double fingerprint (and N=200 when requested).  A convention only
counts as pinned if the checked grid matches to <1e-5 rel AND alpha*
is a clean value.

Usage: python tools/cont_pin.py [--n200]
"""

from __future__ import annotations

import sys

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

PUB = {50: -4.5638509, 100: -4.6443979, 200: -4.6848759}

YD = lambda a, c: 1 + 2 * (a + c)


def build(N, alpha, wb_fac, uq, ureg_target=False, f=0.0):
    """[y_int; u_bnd] QP: returns (w, q, A, b) with diagonal Hessian w.

    wb_fac: boundary tracking weight as a multiple of h^2 (0 = none,
    0.5 = trapezoid, 1.0 = full vertex weight).
    uq: u-regularization quadrature — "h" (line trapezoid), "1" (plain
    sum), "h2" (area weight).
    ureg_target: if True the regularizer is (alpha/2)*uq*sum (u-yd_b)^2
    (constant dropped) instead of (alpha/2)*uq*sum u^2.
    f: constant PDE right-hand side (-lap y = f; b = h^2 f).
    """
    h = 1.0 / N
    ni = N - 1
    ny = ni * ni
    nu = 4 * ni
    n = ny + nu
    yidx = lambda i, j: (i - 1) * ni + (j - 1)

    def uidx(side, k):  # side 0:j=0, 1:j=N, 2:i=0, 3:i=N; k in 1..ni
        return ny + side * ni + (k - 1)

    rows, cols, vals = [], [], []
    r = 0
    for i in range(1, N):
        for j in range(1, N):
            rows.append(r); cols.append(yidx(i, j)); vals.append(4.0)
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 1 <= ii <= ni and 1 <= jj <= ni:
                    c = yidx(ii, jj)
                elif jj == 0:
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
    b = np.full(r, h * h * f)

    g = np.arange(1, N) * h
    X1, X2 = np.meshgrid(g, g, indexing="ij")
    ydv = YD(X1, X2).ravel()

    # boundary vertices (non-corner) in uidx order: sides bottom/top/
    # left/right, coordinate along the side = k*h
    yd_b = np.concatenate([
        YD(g, 0.0 * g),   # bottom  (x2 = 0)
        YD(g, 0.0 * g + 1.0),  # top (x2 = 1)
        YD(0.0 * g, g),   # left   (x1 = 0)
        YD(0.0 * g + 1.0, g),  # right (x1 = 1)
    ])

    wy = h * h
    wb = wb_fac * h * h
    wu_reg = alpha * {"h": h, "1": 1.0, "h2": h * h}[uq]
    w = np.concatenate([np.full(ny, wy), np.full(nu, wu_reg + wb)])
    qu = -wb * yd_b
    if ureg_target:
        qu = qu - wu_reg * yd_b
    q = np.concatenate([-wy * ydv, qu])
    return w, q, A, b


def solve_eq(w, q, A, b):
    """Equality-constrained diagonal-Hessian QP via sparse KKT."""
    n = len(w)
    m = len(b)
    K = sp.bmat([[sp.diags(w), A.T], [A, None]], format="csc")
    lu = spla.splu(K)
    sol = lu.solve(np.concatenate([-q, b]))
    # one refinement pass (splu on the indefinite KKT is good enough
    # for a fingerprint, refine to be safe)
    for _ in range(2):
        r = np.concatenate([-q, b]) - K @ sol
        sol = sol + lu.solve(r)
    x = sol[:n]
    return 0.5 * float(np.sum(w * x * x)) + float(q @ x)


def obj(N, alpha, wb_fac, uq, tgt=False, f=0.0, _cache={}):
    key = (N, alpha, wb_fac, uq, tgt, f)
    if key not in _cache:
        _cache[key] = solve_eq(*build(N, alpha, wb_fac, uq, tgt, f))
    return _cache[key]


def root_alpha(N, target, wb_fac, uq, tgt=False, f=0.0):
    """Brentq on log10(alpha) for obj(N, alpha) = target."""
    from scipy.optimize import brentq

    fn = lambda la: obj(N, 10.0 ** la, wb_fac, uq, tgt, f) - target
    lo, hi = -6.0, 0.5
    if fn(lo) * fn(hi) > 0:
        return None
    la = brentq(fn, lo, hi, xtol=1e-13)
    return 10.0 ** la


def fit2(wb_fac, uq, tgt):
    """Fit (alpha, f) to PUB[50] and PUB[100]; return held-out rel200."""
    from scipy.optimize import brentq

    def g(f):
        a = root_alpha(50, PUB[50], wb_fac, uq, tgt, f)
        if a is None:
            return None, None
        return a, obj(100, a, wb_fac, uq, tgt, f) - PUB[100]

    # bracket f
    fs = np.linspace(-30.0, 30.0, 13)
    vals = []
    for f in fs:
        a, d = g(f)
        vals.append((f, a, d))
    br = None
    for (f1, a1, d1), (f2, a2, d2) in zip(vals, vals[1:]):
        if d1 is not None and d2 is not None and d1 * d2 < 0:
            br = (f1, f2)
            break
    if br is None:
        return None
    fstar = brentq(lambda f: g(f)[1], br[0], br[1], xtol=1e-10)
    astar = root_alpha(50, PUB[50], wb_fac, uq, tgt, fstar)
    return astar, fstar


def main():
    two_param = "--fit2" in sys.argv
    results = []
    for wb_fac in (0.0, 0.5, 1.0):
        for uq in ("h", "1", "h2"):
            for tgt in (False, True):
                a = root_alpha(50, PUB[50], wb_fac, uq, tgt)
                if a is None:
                    continue
                o100 = obj(100, a, wb_fac, uq, tgt)
                rel100 = abs(o100 - PUB[100]) / abs(PUB[100])
                print(f"wb={wb_fac} uq={uq} tgt={int(tgt)}: "
                      f"alpha*={a:.8g} rel100={rel100:.2e}", flush=True)
                results.append((rel100, wb_fac, uq, tgt, a))
    results.sort()
    if results:
        rel, wb_fac, uq, tgt, a = results[0]
        print(f"\nBEST 1-param: wb={wb_fac} uq={uq} tgt={int(tgt)} "
              f"alpha={a:.8g} rel100={rel:.2e}")

    if two_param:
        print("\n2-param (alpha, f) fits to N=50+100, held-out N=200:")
        for wb_fac in (0.0, 0.5, 1.0):
            for uq in ("h", "1"):
                for tgt in (False, True):
                    r = fit2(wb_fac, uq, tgt)
                    if r is None:
                        print(f"wb={wb_fac} uq={uq} tgt={int(tgt)}: no fit")
                        continue
                    a, f = r
                    o200 = obj(200, a, wb_fac, uq, tgt, f)
                    rel200 = abs(o200 - PUB[200]) / abs(PUB[200])
                    print(f"wb={wb_fac} uq={uq} tgt={int(tgt)}: "
                          f"alpha*={a:.8g} f*={f:.6g} rel200={rel200:.2e}",
                          flush=True)


if __name__ == "__main__":
    main()
