"""Exact solver for POWELL20 — the fingerprint oracle behind
tools/maros_sif.py's POWELL20 encoding.

POWELL20 (CUTE POWELL20.SIF; Maros-Meszaros repository) is

    min 1/2 ||x||^2   s.t.   x_{i+1 mod n} - x_i >= 0.5 + (-1)^(i+1) i,

i = 1..n, n = 10000 (the last row wraps to x_1).  The optimal solution
is almost fully active and highly degenerate, which defeats f64
active-set and first-order methods.  As with tools/liswet_exact.py,
a Mehrotra predictor-corrector IPM in numpy longdouble solves it
exactly: the Newton normal matrix I + D' diag(lam/s) D for the cyclic
first-difference D is a cyclic tridiagonal matrix, factorized as a
tridiagonal LDL^T (via liswet_exact.penta_ldl with an empty second
band) plus a rank-2 Woodbury update for the wrap-around corner.

Result: objective 5.20895828e10 vs published 5.2089583e10 -> rel err
3.6e-9 (mu ~ 8e-25, 44 iterations, ~9 s).  Sign/offset variants of the
rhs ((-1)^i, -0.5) produce objectives far from the published value, so
the assignment is unambiguous.

Usage: python tools/powell20_exact.py [n]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "tools")
from liswet_exact import penta_ldl, penta_solve  # noqa: E402

LD = np.longdouble


def D_apply(x):
    """Cyclic forward difference: (Dx)_i = x_{i+1 mod n} - x_i."""
    return np.roll(x, -1) - x


def Dt_apply(lam):
    return np.roll(lam, 1) - lam


def solve_cyclic_diff_qp(c, max_iter=200, mu_tol=1e-22, verbose=False):
    """min 1/2||x||^2 s.t. D x >= c with cyclic first-difference D."""
    c = np.asarray(c, dtype=LD)
    n = len(c)
    x = np.zeros(n, dtype=LD)
    s = np.maximum(D_apply(x) - c, LD(1))
    lam = np.ones(n, dtype=LD)
    mu = LD(1)
    for it in range(max_iter):
        r_d = x - Dt_apply(lam)
        r_p = D_apply(x) - c - s
        mu = np.dot(s, lam) / n
        if verbose and it % 10 == 0:
            print(f"  it {it}: mu={float(mu):.3e} "
                  f"|r_p|={float(np.abs(r_p).max()):.2e}")
        if mu < LD(mu_tol) and np.abs(r_p).max() < LD(1e-12) * max(
                1.0, float(np.abs(c).max())):
            break
        w = lam / s
        wm = np.roll(w, 1)
        main = 1 + w + wm
        sub1 = np.zeros(n, dtype=LD)
        sub1[1:] = -w[:-1]
        a_corner = -w[-1]  # M[0, n-1] = M[n-1, 0]
        fac = penta_ldl(main, sub1, np.zeros(n, dtype=LD))

        e0 = np.zeros(n, dtype=LD)
        e0[0] = 1
        en = np.zeros(n, dtype=LD)
        en[-1] = 1
        T0 = penta_solve(fac, e0)
        Tn = penta_solve(fac, en)
        K = np.array([[T0[0], Tn[0] + 1 / a_corner],
                      [T0[-1] + 1 / a_corner, Tn[-1]]], dtype=LD)

        def msolve(b):
            tb = penta_solve(fac, b)
            det = K[0, 0] * K[1, 1] - K[0, 1] * K[1, 0]
            y0 = (K[1, 1] * tb[0] - K[0, 1] * tb[-1]) / det
            y1 = (-K[1, 0] * tb[0] + K[0, 0] * tb[-1]) / det
            return tb - (T0 * y0 + Tn * y1)

        def apply_M(v):
            mv = main * v
            mv[:-1] += sub1[1:] * v[1:]
            mv[1:] += sub1[1:] * v[:-1]
            mv[0] += a_corner * v[-1]
            mv[-1] += a_corner * v[0]
            return mv

        def newton(comp_target):
            rhs = -r_d + Dt_apply((comp_target - s * lam - lam * r_p) / s)
            dx = msolve(rhs)
            for _ in range(2):
                dx = dx + msolve(rhs - apply_M(dx))
            ds = D_apply(dx) + r_p
            dlam = (comp_target - s * lam - lam * ds) / s
            return dx, ds, dlam

        def max_step(ds, dlam, tau):
            alpha = LD(1)
            neg = ds < 0
            if neg.any():
                alpha = min(alpha, (tau * (-s[neg] / ds[neg])).min())
            neg = dlam < 0
            if neg.any():
                alpha = min(alpha, (tau * (-lam[neg] / dlam[neg])).min())
            return alpha

        dxa, dsa, dla = newton(np.zeros(n, dtype=LD))
        a_aff = max_step(dsa, dla, LD(1))
        mu_aff = np.dot(s + a_aff * dsa, lam + a_aff * dla) / n
        sigma = (mu_aff / mu) ** 3
        dx, ds, dlam = newton(sigma * mu - dsa * dla)
        tau = LD(0.99) if mu > LD(1e-14) else LD(0.999)
        alpha = max_step(ds, dlam, tau)
        x += alpha * dx
        s += alpha * ds
        lam += alpha * dlam
    return x, LD(0.5) * np.sum(x * x), it, float(mu)


def main(argv):
    import maros_sif as ms

    n = int(argv[0]) if argv else 10000
    i1 = np.arange(1, n + 1, dtype=LD)
    c = LD(0.5) + (-1) ** (i1 + 1) * i1
    x, obj, its, mu = solve_cyclic_diff_qp(c)
    pub = ms.PUBLISHED["POWELL20"]
    rel = abs(float(obj) - pub) / abs(pub)
    print(f"POWELL20 n={n}: obj={float(obj):.8e} published={pub:.7e} "
          f"rel={rel:.1e} iters={its} mu={mu:.1e}")


if __name__ == "__main__":
    main(sys.argv[1:])
