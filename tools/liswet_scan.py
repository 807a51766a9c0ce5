"""Identify LISWET2-6's g functions by exact-IPM fingerprint.

LISWET2-6's published optima all sit near 25.0 — the projected noise
power — which is the signature of a CONVEX g: its second differences
are >= 0, so the data term g contributes slack, not residual, and the
optimum is (almost) the projection of the 0.1 sin(i) noise onto the
shifted k-convexity cone.  The shift h^2 g''(t) ~ 1e-8 is tiny, but the
LISWET dual variables are huge (condition ~N^4), so different convex g
still separate in the 4th significant digit — exactly where the
published values 24.998076 / 25.001220 / 25.000112 / 25.034253 /
24.995748 differ.

This tool evaluates a battery of candidate convex g through the exact
longdouble IPM (tools/liswet_exact.py) and reports, per candidate, the
closest published LISWET2-6 value and the relative error — the same
fingerprint methodology that pinned LISWET1/7-12.

Usage: python tools/liswet_scan.py [candidate ...]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "tools")

from liswet_exact import LD, solve_convex_regression  # noqa: E402

PUB = {
    "LISWET2": 2.4998076e01,
    "LISWET3": 2.5001220e01,
    "LISWET4": 2.5000112e01,
    "LISWET5": 2.5034253e01,
    "LISWET6": 2.4995748e01,
}

CANDIDATES = {
    "t": lambda t: t,
    "t^2": lambda t: t * t,
    "t^3": lambda t: t**3,
    "t^4": lambda t: t**4,
    "t^(3/2)": lambda t: t ** LD(1.5),
    "exp(t)": lambda t: np.exp(t),
    "exp(-t)": lambda t: np.exp(-t),
    "cosh(t)": lambda t: np.cosh(t),
    "cosh(t-1/2)": lambda t: np.cosh(t - LD(0.5)),
    "sinh(t)": lambda t: np.sinh(t),
    "1/(1+t)": lambda t: 1 / (1 + t),
    "-log(1+t)": lambda t: -np.log(1 + t),
    "|t-1/2|": lambda t: np.abs(t - LD(0.5)),
    "(t-1/2)^2": lambda t: (t - LD(0.5)) ** 2,
    "t*log(t)": lambda t: np.where(t > 0, t * np.log(np.where(t > 0, t, 1)), LD(0)),
    "tan(t)": lambda t: np.tan(t),
}


def main(argv):
    names = argv or sorted(CANDIDATES)
    N = 10002
    t = np.linspace(LD(0), LD(1), N)
    i = np.arange(1, N + 1).astype(LD)
    noise = LD(0.1) * np.sin(i)
    for name in names:
        g = CANDIDATES[name]
        b = g(t) + noise
        x, obj, its, mu = solve_convex_regression(b)
        best = min(PUB, key=lambda k: abs(float(obj) - PUB[k]))
        rel = abs(float(obj) - PUB[best]) / abs(PUB[best])
        flag = " <== MATCH" if rel < 2e-4 else ""
        print(f"g={name:<12} obj={float(obj):.7f} closest={best} "
              f"({PUB[best]:.6f}) rel={rel:.1e} iters={its} "
              f"mu={mu:.1e}{flag}", flush=True)


# Round-2 battery: strongly-curved convex g (reach below the mild-convex
# floor 24.99997) and mildly-concave g (reach above it) — the regimes the
# published LISWET2-6 values 24.9957..25.0343 straddle.
CANDIDATES.update({
    "-sqrt(t)": lambda t: -np.sqrt(t),
    "1/(0.1+t)": lambda t: 1 / (LD(0.1) + t),
    "exp(-10t)": lambda t: np.exp(-10 * t),
    "exp(-20t)": lambda t: np.exp(-20 * t),
    "-log(0.1+t)": lambda t: -np.log(LD(0.1) + t),
    "t-t^2": lambda t: t - t * t,
    "log(1+t)": lambda t: np.log(1 + t),
    "sin(t)": lambda t: np.sin(t),
    "cos(t)": lambda t: np.cos(t),
    "sqrt(1+t)": lambda t: np.sqrt(1 + t),
    "t^10": lambda t: t**10,
    "10*t^2": lambda t: 10 * t * t,
})

if __name__ == "__main__":
    main(sys.argv[1:])
