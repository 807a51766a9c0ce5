"""Lasso regression QP (reference: docs/examples/lasso.rst)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import osqp_tpu
from osqp_tpu.models import build_lasso


def main():
    rng = np.random.default_rng(1)
    m, n = 200, 50
    Ad = rng.standard_normal((m, n))
    x_true = np.zeros(n)
    x_true[rng.choice(n, 8, replace=False)] = rng.standard_normal(8) * 2
    b = Ad @ x_true + 0.1 * rng.standard_normal(m)
    gamma = 0.1 * np.max(np.abs(Ad.T @ b))

    P, q, A, l, u = build_lasso(Ad, b, gamma)
    res = osqp_tpu.Solver(P, q, A, l, u, polish=True, verbose=False).solve()
    x = res.x[:n]
    print("status:", res.info.status)
    print("nonzeros recovered:", int(np.sum(np.abs(x) > 1e-3)), "/ 8 true")
    print("objective:", 0.5 * np.sum((Ad @ x - b) ** 2) + gamma * np.sum(np.abs(x)))


if __name__ == "__main__":
    main()
