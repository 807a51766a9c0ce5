"""Fingerprint scan for KSIP (n=20, m=1001; published 5.7579794e-1).

KSIP is the discretized convex semi-infinite QP of Kortanek & No (a
central cutting-plane method paper): a degree-(n-1) polynomial
P_x(t) = sum_j x_j t^{j-1} must dominate a target h(t) on a uniform
grid of [0, 1] (1001 points <-> step 1e-3), with a strictly convex
quadratic cost.  The exact cost and target are scanned here: each
(cost, h) candidate is a tiny QP solved tightly in f64; a candidate
reproducing the published optimum to ~1e-6 rel IS the problem (the
same fingerprint methodology as the rest of tools/maros_sif.py).

Usage: python tools/ksip_scan.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

PUB = 5.7579794e-1
N = 20
M = 1001


def solve(P, q, A, l, u, const=0.0):
    import osqp_tpu

    s = osqp_tpu.Solver(P=P, q=q, A=A, l=l, u=u, eps_abs=1e-10,
                        eps_rel=1e-10, max_iter=200_000, polish=True,
                        verbose=False, dtype="float64")
    r = s.solve()
    return r.info.obj_val + const, int(r.info.status_val)


def main():
    t = np.linspace(0.0, 1.0, M)
    V = np.vander(t, N, increasing=True)  # V[i, j] = t_i^j
    j1 = np.arange(1, N + 1, dtype=float)

    costs = {
        "0.5||x||^2": (np.eye(N), np.zeros(N), 0.0),
        "||x||^2": (2 * np.eye(N), np.zeros(N), 0.0),
        "0.5 sum x_j^2/j": (np.diag(1 / j1), np.zeros(N), 0.0),
        "0.5 sum j x_j^2": (np.diag(j1), np.zeros(N), 0.0),
        "0.5||x-e1||^2": (np.eye(N), -np.eye(N)[0], 0.5),
        "0.5||x||^2+sum x/j": (np.eye(N), 1 / j1, 0.0),
        "0.5||x||^2-sum x/j": (np.eye(N), -1 / j1, 0.0),
    }
    targets = {
        "sin(t)": np.sin(t),
        "cos(t)": np.cos(t),
        "exp(t)": np.exp(t),
        "1/(1+t)": 1 / (1 + t),
        "log(1+t)": np.log(1 + t),
        "sqrt(t)": np.sqrt(t),
        "sin(pi t)": np.sin(np.pi * t),
        "cos(pi t)": np.cos(np.pi * t),
        "tan(t)": np.tan(t),
        "sinh(t)": np.sinh(t),
        "t^2+1": t * t + 1,
        "2+sin(3t)": 2 + np.sin(3 * t),
    }
    INF = 1e30
    rows = []
    for cname, (P, q, c0) in costs.items():
        for hname, h in targets.items():
            obj, status = solve(P, q, V, h, np.full(M, INF), c0)
            rel = abs(obj - PUB) / PUB
            flag = " <== MATCH" if rel < 1e-5 else ""
            line = (f"cost={cname:<20} h={hname:<10} obj={obj:.7f} "
                    f"rel={rel:.1e} st={status}{flag}")
            print(line, flush=True)
            rows.append((rel, line))
    rows.sort()
    print("\nbest:")
    for rel, line in rows[:5]:
        print(" ", line)


if __name__ == "__main__":
    main()
