"""basic_qp2 suite — exact port of tests/basic_qp2 (reference:
basic_qp2/generate_problem.py:5-34, test_basic_qp2.h).

A P that is PSD-but-singular (diag(11, 0)) with one-sided constraints:
exercises the kkt_lu-style robustness and the q/u parametric updates
against the generator's golden solutions.  Assertions use the
reference's relative inf-norm criterion at TESTS_TOL = 1e-4."""

import numpy as np
import scipy.sparse as sp

import osqp_tpu
from osqp_tpu import constants as con

from conftest import TESTS_TOL

P = sp.triu(np.array([[11.0, 0.0], [0.0, 0.0]]), format="csc")
Q = np.array([3.0, 4.0])
A = sp.csc_matrix(
    np.array([[-1.0, 0.0], [0.0, -1.0], [-1.0, 3.0], [2.0, 5.0], [3.0, 4.0]])
)
L = -np.inf * np.ones(A.shape[0])
U = np.array([0.0, 0.0, -15.0, 100.0, 80.0])

X_TEST = np.array([15.0, -0.0])
Y_TEST = np.array([0.0, 508.0, 168.0, 0.0, 0.0])
OBJ_TEST = 1282.5

Q_NEW = np.array([1.0, 1.0])
U_NEW = np.array([-2.0, 0.0, -20.0, 100.0, 80.0])
X_NEW = np.array([20.0, -0.0])
Y_NEW = np.array([0.0, 664.0, 221.0, 0.0, 0.0])
OBJ_NEW = 2220.0


def _rel_err(got, want, scale):
    return np.max(np.abs(np.asarray(got) - want)) / np.max(np.abs(scale))


def _make():
    return osqp_tpu.Solver(
        P=P, q=Q, A=A, l=L, u=U,
        alpha=1.6, rho=0.1, polish=True, verbose=False,
    )


def test_basic_qp2_solve():
    s = _make()
    res = s.solve()
    assert res.info.status_val == con.OSQP_SOLVED
    # NB: the reference divides by x_test_NEW even for the initial
    # solve (test_basic_qp2.h:47-58) — ported literally.
    assert _rel_err(res.x, X_TEST, X_NEW) < TESTS_TOL
    assert _rel_err(res.y, Y_TEST, Y_NEW) < TESTS_TOL
    assert abs(res.info.obj_val - OBJ_TEST) / abs(OBJ_TEST) < TESTS_TOL


def test_basic_qp2_update():
    s = _make()
    s.solve()
    s.update_lin_cost(Q_NEW)
    s.update_upper_bound(U_NEW)
    res = s.solve()
    assert res.info.status_val == con.OSQP_SOLVED
    assert _rel_err(res.x, X_NEW, X_NEW) < TESTS_TOL
    assert _rel_err(res.y, Y_NEW, Y_NEW) < TESTS_TOL
    assert abs(res.info.obj_val - OBJ_NEW) / abs(OBJ_NEW) < TESTS_TOL


def test_basic_qp2_second_backend():
    """The reference repeats the suite with its second backend (MKL
    Pardiso); here the full-KKT LU backend plays that role."""
    s = osqp_tpu.Solver(
        P=P, q=Q, A=A, l=L, u=U,
        alpha=1.6, rho=0.1, polish=True, verbose=False,
        linsys_solver="kkt_lu",
    )
    res = s.solve()
    assert res.info.status_val == con.OSQP_SOLVED
    assert _rel_err(res.x, X_TEST, X_NEW) < TESTS_TOL
    assert abs(res.info.obj_val - OBJ_TEST) / abs(OBJ_TEST) < TESTS_TOL
