"""Fingerprint scan for YAO (n=2002, m=2000; published 1.9770426e2).

YAO (CUTE YAO.SIF) is a k-convex data-smoothing QP with the same
structure as the LISWET family:

    min 1/2 sum (x_i - b_i)^2   s.t.   x_i - 2 x_{i+1} + x_{i+2} >= 0

on n = 2002 points (m = n-2 = 2000 second-difference rows matches the
repository's dimensions exactly).  The data function b is identified
here by fingerprint: each candidate is solved EXACTLY by the longdouble
interior-point oracle from tools/liswet_exact.py and the optimal
objective compared against the published 197.70426 — the same
methodology that pinned LISWET1/7-12.

Usage: python tools/yao_scan.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")

from liswet_exact import solve_convex_regression

PUB = 1.9770426e2
N = 2002


def main():
    i = np.arange(1, N + 1, dtype=np.longdouble)
    grids = {
        "t=(i-1)/(N-1)": (i - 1) / (N - 1),
        "t=i/N": i / N,
        "t=i/(N+1)": i / (N + 1),
    }
    funcs = {
        "sin(2pi t)": lambda t: np.sin(2 * np.pi * t),
        "sin(pi t)": lambda t: np.sin(np.pi * t),
        "sin(4pi t)": lambda t: np.sin(4 * np.pi * t),
        "cos(pi t)": lambda t: np.cos(np.pi * t),
        "cos(2pi t)": lambda t: np.cos(2 * np.pi * t),
        "sqrt(t)": lambda t: np.sqrt(t),
        "sin(t)": lambda t: np.sin(t),
        "exp(t)": lambda t: np.exp(t),
        "-t^2": lambda t: -t * t,
        "t(1-t)": lambda t: t * (1 - t),
        "2sin(2pi t)": lambda t: 2 * np.sin(2 * np.pi * t),
    }
    noises = {
        "none": np.zeros(N, dtype=np.longdouble),
        "0.1 sin(i)": 0.1 * np.sin(i),
    }
    rows = []
    for gname, t in grids.items():
        for fname, f in funcs.items():
            for nname, eta in noises.items():
                b = f(t) + eta
                x, obj, _it, _mu = solve_convex_regression(b)
                rel = abs(float(obj) - PUB) / PUB
                flag = " <== MATCH" if rel < 1e-5 else ""
                line = (f"{gname:<14} b={fname:<12} noise={nname:<10} "
                        f"obj={float(obj):.7f} rel={rel:.1e}{flag}")
                print(line, flush=True)
                rows.append((rel, line))
    rows.sort()
    print("\nbest:")
    for rel, line in rows[:6]:
        print(" ", line)


if __name__ == "__main__":
    main()
