"""Box-constrained least squares (reference: docs/examples/least_squares.rst)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import osqp_tpu
from osqp_tpu.models import build_least_squares


def main():
    rng = np.random.default_rng(6)
    m, n = 100, 30
    Ad = rng.standard_normal((m, n))
    b = rng.standard_normal(m)

    P, q, A, l, u = build_least_squares(Ad, b, lb=0.0, ub=1.0)
    res = osqp_tpu.Solver(P, q, A, l, u, polish=True, verbose=False).solve()
    x = res.x[:n]
    print("status:", res.info.status)
    print("residual:", 0.5 * np.sum((Ad @ x - b) ** 2))
    print("x in box:", bool(np.all(x > -1e-9) and np.all(x < 1 + 1e-9)))


if __name__ == "__main__":
    main()
