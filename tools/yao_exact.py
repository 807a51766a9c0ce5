"""Exact longdouble IPM oracle for the YAO structure (CUTE YAO.SIF).

YAO is a k-convex least-squares smoothing problem (same family as
LISWET but by Aixiang Yao, Virginia Tech, May 1995):

    min 1/2 || x - f ||^2   over x in R^(n+k)
    s.t. Delta^k x >= 0  (n rows),  x_1 >= 0.08,  x_{n+i} = 0 (i=1..k)

with f_i = sin(t_i), n = 2000, k = 2 (matching the repository's
n = 2002 variables / m = 2000 constraint rows).  The grid t_i is the
remaining unknown and is identified by fingerprint against the
published optimum 1.9770426e2 — the same methodology that pinned the
LISWET data conventions (tools/liswet_exact.py).

After eliminating the k fixed trailing variables, the free problem is
min 1/2||x - b||^2 s.t. G x >= h with G banded (second differences +
the e_1 bound row), so each IPM Newton step is one pentadiagonal
longdouble solve — reusing penta_ldl/penta_solve from liswet_exact.

Usage: python tools/yao_exact.py          # scan grid candidates
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")

from liswet_exact import LD, penta_ldl, penta_solve

PUB = 1.9770426e2
NFREE = 2000  # x_1 .. x_2000 free; x_2001 = x_2002 = 0 fixed


def G_apply(x):
    """G x for the 2001-row banded constraint matrix:
    rows 0..1997:  x_i - 2 x_{i+1} + x_{i+2}
    row 1998:      x_1999 - 2 x_2000        (x_2001 = 0)
    row 1999:      x_2000                   (x_2001 = x_2002 = 0)
    row 2000:      x_1                      (the x_1 >= 0.08 bound)
    (0-based: x[0..1999])."""
    n = len(x)
    out = np.zeros(n + 1, dtype=x.dtype)
    out[: n - 2] = x[: n - 2] - 2.0 * x[1 : n - 1] + x[2:]
    out[n - 2] = x[n - 2] - 2.0 * x[n - 1]
    out[n - 1] = x[n - 1]
    out[n] = x[0]
    return out


def Gt_apply(lam):
    n = len(lam) - 1
    y = np.zeros(n, dtype=lam.dtype)
    d2 = lam[: n - 2]
    y[: n - 2] += d2
    y[1 : n - 1] -= 2.0 * d2
    y[2:] += d2
    y[n - 2] += lam[n - 2]
    y[n - 1] -= 2.0 * lam[n - 2]
    y[n - 1] += lam[n - 1]
    y[0] += lam[n]
    return y


def _normal_bands(w, n):
    """Bands of I + G' diag(w) G (pentadiagonal, SPD)."""
    main = np.ones(n, dtype=LD)
    sub1 = np.zeros(n, dtype=LD)  # sub1[i] = M[i, i-1]
    sub2 = np.zeros(n, dtype=LD)  # sub2[i] = M[i, i-2]
    wd = w[: n - 2]  # interior second-difference rows 0..n-3
    # row r touches (r, r+1, r+2) with coeffs (1, -2, 1)
    main[: n - 2] += wd
    main[1 : n - 1] += 4.0 * wd
    main[2:] += wd
    sub1[1 : n - 1] += -2.0 * wd
    sub1[2:] += -2.0 * wd
    sub2[2:] += wd
    # row n-2: coeffs (1, -2) on (n-2, n-1)
    wr = w[n - 2]
    main[n - 2] += wr
    main[n - 1] += 4.0 * wr
    sub1[n - 1] += -2.0 * wr
    # row n-1: coeff 1 on (n-1)
    main[n - 1] += w[n - 1]
    # row n (bound): coeff 1 on 0
    main[0] += w[n]
    return main, sub1, sub2


def solve_yao(b, h, max_iter=200, mu_tol=1e-22, verbose=False):
    """min 1/2||x-b||^2 s.t. G x >= h.  Returns (x, obj, it, mu)."""
    b = np.asarray(b, dtype=LD)
    n = len(b)
    m = n + 1
    h = np.asarray(h, dtype=LD)
    x = b.copy()
    s = np.maximum(G_apply(x) - h, LD(1))
    lam = np.ones(m, dtype=LD)
    mu = LD(1)
    it = 0
    for it in range(max_iter):
        r_d = x - b - Gt_apply(lam)
        r_p = G_apply(x) - h - s
        mu = np.dot(s, lam) / m
        if verbose and it % 10 == 0:
            print(f"  it {it}: mu={float(mu):.3e} "
                  f"|r_p|={float(np.abs(r_p).max()):.2e}")
        if mu < LD(mu_tol) and np.abs(r_p).max() < LD(1e-17):
            break
        w = lam / s
        M_bands = _normal_bands(w, n)
        fac = penta_ldl(*M_bands)

        def newton(comp_target):
            rhs = -r_d + Gt_apply((comp_target - s * lam - lam * r_p) / s)
            dx = penta_solve(fac, rhs)
            for _ in range(2):  # refinement against normal-form rounding
                main, sub1, sub2 = M_bands
                Mdx = main * dx
                Mdx[:-1] += sub1[1:] * dx[1:]
                Mdx[1:] += sub1[1:] * dx[:-1]
                Mdx[:-2] += sub2[2:] * dx[2:]
                Mdx[2:] += sub2[2:] * dx[:-2]
                dx = dx + penta_solve(fac, rhs - Mdx)
            ds = G_apply(dx) + r_p
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

        dxa, dsa, dla = newton(np.zeros(m, dtype=LD))
        a_aff = max_step(dsa, dla, LD(1))
        mu_aff = np.dot(s + a_aff * dsa, lam + a_aff * dla) / m
        sigma = (mu_aff / mu) ** 3
        dx, ds, dlam = newton(sigma * mu - dsa * dla)
        tau = LD(0.99) if mu > LD(1e-14) else LD(0.999)
        alpha = max_step(ds, dlam, tau)
        x += alpha * dx
        s += alpha * ds
        lam += alpha * dlam
    obj = LD(0.5) * np.sum((x - b) ** 2)
    return x, obj, it, float(mu)


def main():
    i = np.arange(1, NFREE + 2 + 1, dtype=np.longdouble)  # 1..2002
    grids = {
        "t=i/2000": i / 2000,
        "t=(i-1)/2000": (i - 1) / 2000,
        "t=i/2002": i / 2002,
        "t=(i-1)/1999": (i - 1) / 1999,
        "t=(i-1)/2001": (i - 1) / 2001,
        "t=i": i,
        "t=i/1000": i / 1000,
        "t=2pi i/2002": 2 * np.pi * i / 2002,
        "t=pi i/2002": np.pi * i / 2002,
    }
    rows = []
    for gname, t in grids.items():
        f = np.sin(t.astype(LD))
        b = f[:NFREE]
        fixed_resid = LD(0.5) * np.sum(f[NFREE:] ** 2)
        h = np.zeros(NFREE + 1, dtype=LD)
        h[-1] = LD(0.08)
        x, obj, it, mu = solve_yao(b, h)
        total = float(obj + fixed_resid)
        rel = abs(total - PUB) / PUB
        flag = " <== MATCH" if rel < 1e-5 else ""
        line = (f"{gname:<14} obj={total:.7f} rel={rel:.1e} "
                f"it={it} mu={mu:.1e}{flag}")
        print(line, flush=True)
        rows.append((rel, line))
    rows.sort()
    print("\nbest:")
    for rel, line in rows[:4]:
        print(" ", line)


if __name__ == "__main__":
    main()
