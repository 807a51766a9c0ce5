"""Support-vector-machine QP (reference: docs/examples/svm.rst)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import osqp_tpu
from osqp_tpu.models import build_svm


def main():
    rng = np.random.default_rng(5)
    m, n = 200, 10
    w_true = rng.standard_normal(n)
    Ad = rng.standard_normal((m, n))
    b = np.sign(Ad @ w_true + 0.1 * rng.standard_normal(m))
    b[b == 0] = 1.0

    P, q, A, l, u = build_svm(Ad, b, lam=0.5)
    res = osqp_tpu.Solver(P, q, A, l, u, polish=True, verbose=False).solve()
    w = res.x[:n]
    acc = np.mean(np.sign(Ad @ w) == b)
    print("status:", res.info.status)
    print(f"training accuracy: {acc:.3f}")


if __name__ == "__main__":
    main()
