"""Huber fitting QP (reference: docs/examples/huber.rst) — robust
regression that shrugs off gross outliers where least squares cannot."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import osqp_tpu
from osqp_tpu.models import build_huber


def main():
    rng = np.random.default_rng(4)
    m, n = 150, 20
    Ad = rng.standard_normal((m, n))
    x_true = rng.standard_normal(n)
    b = Ad @ x_true + 0.05 * rng.standard_normal(m)
    b[: m // 10] += 15.0  # 10% gross outliers

    P, q, A, l, u = build_huber(Ad, b, M=1.0)
    res = osqp_tpu.Solver(P, q, A, l, u, polish=True, verbose=False).solve()
    x = res.x[:n]
    x_ls = np.linalg.lstsq(Ad, b, rcond=None)[0]
    print("status:", res.info.status)
    print("huber error:", np.linalg.norm(x - x_true))
    print("least-squares error:", np.linalg.norm(x_ls - x_true))


if __name__ == "__main__":
    main()
