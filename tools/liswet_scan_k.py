"""Test the K-order hypothesis for LISWET2-6.

Li & Swetits' subject is k-CONVEX regression: min 1/2||x-b||^2 s.t.
the K-th forward differences of x are nonnegative.  The scan in
tools/liswet_scan.py showed that at K=2 every convex g lands on
~24.9998 — but the published LISWET2-6 optima (24.9957..25.0343)
straddle that floor, which no K=2 instance can do.  Varying K moves
the noise-projection floor itself: the feasible cone changes, so the
projection of the same 0.1 sin(i) noise gives a different optimum.

Hypothesis: LISWET1-6 share g = sqrt(t) and differ in K (CUTE LISWET
SIF exposes both N and K as parameters); LISWET1 is the verified K=2
instance, so LISWET2-6 should be K=3..7 in some order.  This tool
computes the exact optimum for a given g over K = 2..8 with the same
longdouble Mehrotra IPM, where the Newton normal matrix
I + D' diag(w) D is banded with bandwidth K -> one O(N K^2) banded
LDL^T per step.

Usage: python tools/liswet_scan_k.py [gname] [Kmin Kmax]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "tools")

from liswet_exact import LD  # noqa: E402

PUB = {
    "LISWET1": 3.6122402e01,
    "LISWET2": 2.4998076e01,
    "LISWET3": 2.5001220e01,
    "LISWET4": 2.5000112e01,
    "LISWET5": 2.5034253e01,
    "LISWET6": 2.4995748e01,
    "LISWET7": 4.9884089e02,
    "LISWET8": 7.1447006e02,
    "LISWET9": 1.9632513e03,
    "LISWET10": 4.9485785e01,
    "LISWET11": 4.9523957e01,
    "LISWET12": 1.7369274e03,
}


def diff_coeffs(K):
    """Forward-difference coefficients: Delta^K x_i = sum_j c_j x_{i+j},
    c_j = (-1)^(K-j) C(K,j)."""
    from math import comb

    return np.array([(-1) ** (K - j) * comb(K, j) for j in range(K + 1)],
                    dtype=LD)


def D_apply(x, c):
    K = len(c) - 1
    m = len(x) - K
    out = np.zeros(m, dtype=LD)
    for j, cj in enumerate(c):
        out += cj * x[j:j + m]
    return out


def Dt_apply(lam, c, N):
    y = np.zeros(N, dtype=LD)
    m = len(lam)
    for j, cj in enumerate(c):
        y[j:j + m] += cj * lam
    return y


def banded_ldl(Bnd):
    """LDL^T of an SPD banded matrix given as Bnd[d][i] = A[i, i-d],
    d = 0..K (lower bands, Bnd[d][i] defined for i >= d).  Returns
    (Dd, Lb) with Lb[d][i] = L[i, i-d]."""
    K = len(Bnd) - 1
    N = len(Bnd[0])
    Dd = np.zeros(N, dtype=LD)
    Lb = [np.zeros(N, dtype=LD) for _ in range(K + 1)]
    for i in range(N):
        for d in range(min(i, K), 0, -1):
            a = Bnd[d][i]
            # L[i, i-d] = (A[i,i-d] - sum_{k} L[i,k] D[k] L[i-d,k]) / D[i-d]
            for e in range(d + 1, min(i, K) + 1):
                # k = i - e; L[i-d, k] = Lb[e-d][i-d]
                a -= Lb[e][i] * Dd[i - e] * Lb[e - d][i - d]
            Lb[d][i] = a / Dd[i - d]
        a = Bnd[0][i]
        for e in range(1, min(i, K) + 1):
            a -= Lb[e][i] * Lb[e][i] * Dd[i - e]
        Dd[i] = a
    return Dd, Lb


def banded_solve(fac, rhs):
    Dd, Lb = fac
    K = len(Lb) - 1
    N = len(Dd)
    y = np.array(rhs, dtype=LD)
    for i in range(N):
        for d in range(1, min(i, K) + 1):
            y[i] -= Lb[d][i] * y[i - d]
    y /= Dd
    for i in range(N - 2, -1, -1):
        for d in range(1, K + 1):
            if i + d < N:
                y[i] -= Lb[d][i + d] * y[i + d]
    return y


def banded_matvec(Bnd, x):
    K = len(Bnd) - 1
    y = Bnd[0] * x
    for d in range(1, K + 1):
        y[d:] += Bnd[d][d:] * x[:-d]
        y[:-d] += Bnd[d][d:] * x[d:]
    return y


def normal_bands(w, c, N):
    """Bands of I + D' diag(w) D: A[i, i-d] = delta_d0 +
    sum_r w[r] c[i-r] c[i-d-r] over valid rows r."""
    K = len(c) - 1
    m = len(w)
    wp = np.zeros(N, dtype=LD)
    wp[:m] = w
    # A[i,i-d] = sum_{a=d}^{K} c[a] c[a-d] w[i-a]  (row r = i-a)
    i = np.arange(N)
    Bnd = []
    for d in range(K + 1):
        acc = np.zeros(N, dtype=LD)
        for a in range(d, K + 1):
            r = i - a
            valid = (r >= 0) & (r <= m - 1)
            acc[valid] += c[a] * c[a - d] * wp[r[valid]]
        Bnd.append(acc)
    Bnd[0] += 1
    return Bnd


def solve_k_convex(b, K, max_iter=200, mu_tol=1e-22, verbose=False):
    b = np.asarray(b, dtype=LD)
    N = len(b)
    c = diff_coeffs(K)
    m = N - K
    x = b.copy()
    s = np.maximum(D_apply(x, c), LD(1))
    lam = np.ones(m, dtype=LD)
    mu = LD(1)
    for it in range(max_iter):
        r_d = x - b - Dt_apply(lam, c, N)
        r_p = D_apply(x, c) - s
        mu = np.dot(s, lam) / m
        if verbose and it % 10 == 0:
            print(f"  it {it}: mu={float(mu):.3e} "
                  f"|r_p|={float(np.abs(r_p).max()):.2e}", flush=True)
        if mu < LD(mu_tol) and np.abs(r_p).max() < LD(1e-16):
            break
        w = lam / s
        Bnd = normal_bands(w, c, N)
        fac = banded_ldl(Bnd)

        def newton(comp_target):
            rhs = -r_d + Dt_apply((comp_target - s * lam - lam * r_p) / s,
                                  c, N)
            dx = banded_solve(fac, rhs)
            for _ in range(2):
                dx = dx + banded_solve(fac, rhs - banded_matvec(Bnd, dx))
            ds = D_apply(dx, c) + r_p
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


GFUNCS = {
    "sqrt(t)": lambda t: np.sqrt(t),
    "sin(pi t)": lambda t: np.sin(np.pi * t),
    "t": lambda t: t,
}


def main(argv):
    gname = argv[0] if argv else "sqrt(t)"
    kmin = int(argv[1]) if len(argv) > 1 else 2
    kmax = int(argv[2]) if len(argv) > 2 else 7
    N = 10002
    t = np.linspace(LD(0), LD(1), N)
    i = np.arange(1, N + 1).astype(LD)
    b = GFUNCS[gname](t) + LD(0.1) * np.sin(i)
    for K in range(kmin, kmax + 1):
        x, obj, its, mu = solve_k_convex(b, K)
        best = min(PUB, key=lambda k: abs(float(obj) - PUB[k]))
        rel = abs(float(obj) - PUB[best]) / abs(PUB[best])
        flag = " <== MATCH" if rel < 1e-4 else ""
        print(f"K={K} g={gname:<10} obj={float(obj):.7f} closest={best} "
              f"({PUB[best]:.6f}) rel={rel:.1e} iters={its} "
              f"mu={mu:.1e}{flag}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
