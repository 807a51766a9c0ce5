"""Fingerprint scan for UBH1 (n=18009, m=12000; published 1.1160008).

The repository dimensions pin the structure exactly: 9 variables per
grid point x 2001 points (3 positions y, 3 velocities v, 3 controls u)
and 6 x 2000 dynamics rows — a 3-D double integrator

    min 1/2 integral ||u||^2   s.t.  y' = v,  v' = u,  BCs,

discretized on N = 2000 intervals.  The coordinates decouple given the
boundary conditions, so each candidate (T, discretization, objective
weighting, per-coordinate BCs) is solved per-coordinate as an exact
equality-constrained QP (banded KKT, scipy splu) and the summed
optimum compared against the published value — the fingerprint
methodology of tools/maros_sif.py.

Usage: python tools/ubh1_scan.py
"""

from __future__ import annotations

import itertools
import sys

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

PUB = 1.1160008
N = 2000  # intervals; 2001 grid points


def solve_coord(T, scheme, wkind, y0, v0, yT, vT):
    """Exact single-coordinate solve.  Variables z = [y(0..N), v(0..N),
    u(0..N)]; returns 1/2 sum w_t u_t^2 at the optimum (or None if the
    candidate is infeasible/singular).  vT=None leaves v(N) free."""
    h = T / N
    npts = N + 1
    iy = lambda t: t
    iv = lambda t: npts + t
    iu = lambda t: 2 * npts + t
    nv = 3 * npts
    rows, cols, vals, rhs = [], [], [], []
    r = 0

    def add(cs, vs, b):
        nonlocal r
        rows.extend([r] * len(cs))
        cols.extend(cs)
        vals.extend(vs)
        rhs.append(b)
        r += 1

    for t in range(N):
        if scheme == "euler":
            add([iy(t + 1), iy(t), iv(t)], [1.0, -1.0, -h], 0.0)
            add([iv(t + 1), iv(t), iu(t)], [1.0, -1.0, -h], 0.0)
        elif scheme == "euler_back":
            add([iy(t + 1), iy(t), iv(t + 1)], [1.0, -1.0, -h], 0.0)
            add([iv(t + 1), iv(t), iu(t + 1)], [1.0, -1.0, -h], 0.0)
        else:  # trapezoid
            add([iy(t + 1), iy(t), iv(t), iv(t + 1)],
                [1.0, -1.0, -h / 2, -h / 2], 0.0)
            add([iv(t + 1), iv(t), iu(t), iu(t + 1)],
                [1.0, -1.0, -h / 2, -h / 2], 0.0)
    # boundary conditions as equality rows
    add([iy(0)], [1.0], y0)
    add([iv(0)], [1.0], v0)
    add([iy(N)], [1.0], yT)
    if vT is not None:
        add([iv(N)], [1.0], vT)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(r, nv)).tocsc()
    w = np.zeros(nv)
    if wkind == "sum":
        w[2 * npts:] = 1.0
    elif wkind == "h":
        w[2 * npts:] = h
    else:  # trapezoid weights
        w[2 * npts:] = h
        w[iu(0)] = h / 2
        w[iu(N)] = h / 2
    # regularized KKT (controls with zero weight can exist only if u(N)
    # enters no constraint under euler — give it epsilon weight)
    sigma = 1e-10
    K = sp.bmat([[sp.diags(w + sigma), A.T], [A, None]], format="csc")
    try:
        lu = spla.splu(K)
    except RuntimeError:
        return None
    sol = lu.solve(np.concatenate([np.zeros(nv), np.asarray(rhs)]))
    z = sol[:nv]
    for _ in range(2):  # refinement against the sigma regularization
        r1 = -(w * z + A.T @ sol[nv:])
        r2 = np.asarray(rhs) - A @ z
        d = lu.solve(np.concatenate([r1, r2]))
        z += d[:nv]
        sol += d
    return 0.5 * float(np.sum(w * z * z))


def main():
    Ts = [1.0, 2.0, 5.0, 10.0, 20.0, 100.0, 1000.0, 2000.0]
    schemes = ["euler", "trapezoid"]
    wkinds = ["sum", "h"]
    # per-coordinate BC sets: (y0, v0, yT, vT) for the 3 coordinates
    bcsets = {
        "y:0->1,v:0->0 (x3)": [(0, 0, 1, 0)] * 3,
        "y:0->1,v:0->free (x3)": [(0, 0, 1, None)] * 3,
        "y:0->1,v:1->0 (x3)": [(0, 1, 1, 0)] * 3,
        "y:0->(1,2,3),v:0->0": [(0, 0, 1, 0), (0, 0, 2, 0), (0, 0, 3, 0)],
        "y:1->0,v:0->0 (x3)": [(1, 0, 0, 0)] * 3,
        "y:0->1,v:0->1 (x3)": [(0, 0, 1, 1)] * 3,
    }
    rows = []
    for T, scheme, wk, (bname, bcs) in itertools.product(
            Ts, schemes, wkinds, bcsets.items()):
        tot = 0.0
        ok = True
        for bc in bcs:
            o = solve_coord(T, scheme, wk, *bc)
            if o is None:
                ok = False
                break
            tot += o
        if not ok:
            continue
        rel = abs(tot - PUB) / PUB
        line = (f"T={T:<7} {scheme:<10} w={wk:<4} {bname:<24} "
                f"obj={tot:.7e} rel={rel:.1e}")
        if rel < 1e-5:
            line += " <== MATCH"
        print(line, flush=True)
        rows.append((rel, line))
    rows.sort()
    print("\nbest:")
    for rel, line in rows[:8]:
        print(" ", line)


if __name__ == "__main__":
    main()
