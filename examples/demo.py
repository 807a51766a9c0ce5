"""The classic OSQP demo QP (reference: examples/osqp_demo.c:4-58).

minimize    0.5 x' [[4,1],[1,2]] x + [1,1]' x
subject to  [1,1] <= [[1,1],[1,0],[0,1]] x <= [1,0.7,0.7]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp

import osqp_tpu


def main():
    P = sp.csc_matrix(np.array([[4.0, 1.0], [1.0, 2.0]]))
    q = np.array([1.0, 1.0])
    A = sp.csc_matrix(np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]))
    l = np.array([1.0, 0.0, 0.0])
    u = np.array([1.0, 0.7, 0.7])

    solver = osqp_tpu.Solver(P=P, q=q, A=A, l=l, u=u, verbose=True)
    res = solver.solve()

    print("status:", res.info.status)
    print("x* =", res.x)
    print("y* =", res.y)
    print("obj =", res.info.obj_val)


if __name__ == "__main__":
    main()
