"""Receding-horizon MPC with the block-tridiagonal backend
(reference: docs/examples/mpc.rst — here with stage-interleaved ordering
so the Schur complement is block tridiagonal and factors in O(N b^3)).

Regulates a quadrotor-like double integrator to the origin, re-solving
after each applied input via update_bounds (the parametric MPC loop the
reference performs with osqp_update_bounds)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import osqp_tpu
from osqp_tpu.models import build_mpc_qp


def main():
    dt = 0.1
    Ad = np.array([[1.0, dt], [0.0, 1.0]])
    Bd = np.array([[0.5 * dt * dt], [dt]])
    prob = build_mpc_qp(
        Ad, Bd,
        Q=np.diag([1.0, 0.1]), R=np.array([[0.1]]), QN=10 * np.diag([1.0, 0.1]),
        xinit=[1.0, 0.0], horizon=20,
        xmin=[-5.0, -2.0], xmax=[5.0, 2.0], umin=[-1.0], umax=[1.0],
    )
    solver = osqp_tpu.Solver(
        prob.P, prob.q, prob.A, prob.l, prob.u,
        linsys_solver="block_tridiag", block_size=prob.block_size,
        verbose=False,
    )
    x = np.array([1.0, 0.0])
    print(f"step  state                u       iters")
    for k in range(30):
        res = solver.solve()
        assert res.info.status == "solved", res.info.status
        _, us = prob.split_solution(res.x)
        x = Ad @ x + Bd @ us[0]
        prob.update_xinit(solver, x)
        if k % 5 == 0:
            print(f"{k:4d}  [{x[0]:7.4f} {x[1]:7.4f}]  {us[0,0]:7.4f}  {res.info.iter}")
    print("final state:", x)


if __name__ == "__main__":
    main()
