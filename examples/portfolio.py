"""Markowitz portfolio optimization QP (reference: docs/examples/portfolio.rst).

Also demonstrates the parametric path: sweep risk aversion gamma by
updating only the linear cost (osqp_update_lin_cost, osqp.c:765-795) —
no refactorization, warm-started solves."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import osqp_tpu
from osqp_tpu.models import build_portfolio


def main():
    rng = np.random.default_rng(2)
    n, k = 100, 10
    F = rng.standard_normal((n, k)) * 0.2
    D_diag = np.abs(rng.standard_normal(n)) * 0.1 + 0.02
    mu = rng.standard_normal(n) * 0.05

    P, q, A, l, u = build_portfolio(mu, F, D_diag, gamma=1.0)
    solver = osqp_tpu.Solver(P, q, A, l, u, polish=True, verbose=False)

    print("gamma   exp.return   risk     iters")
    for gamma in [0.1, 0.5, 1.0, 5.0, 10.0]:
        # objective is gamma*(x'Dx + y'y) - mu'x; sweeping gamma is a pure
        # q update after dividing through by gamma: min x'Sx - (1/gamma) mu'x
        q_new = np.concatenate([-mu / gamma, np.zeros(k)])
        solver.update_lin_cost(q_new)
        res = solver.solve()
        x = res.x[:n]
        ret = float(mu @ x)
        risk = float(x @ (F @ F.T + np.diag(D_diag)) @ x)
        print(f"{gamma:5.1f}   {ret:9.5f}   {risk:7.5f}  {res.info.iter}")


if __name__ == "__main__":
    main()
