"""demo, basic_qp2, unconstrained and non_cvx suites.

Ports tests/demo/test_demo.h:7-61, tests/basic_qp2/generate_problem.py,
tests/unconstrained/generate_problem.py, tests/non_cvx/test_non_cvx.h.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import osqp_tpu
from osqp_tpu import constants as con
from conftest import TESTS_TOL, assert_allclose


class TestDemo:
    """The 2-var/3-constraint demo QP (examples/osqp_demo.c:4-58)."""

    @pytest.mark.f32
    def test_demo(self):
        P = sp.csc_matrix(np.array([[4.0, 1.0], [1.0, 2.0]]))
        q = np.array([1.0, 1.0])
        A = sp.csc_matrix(np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]))
        l = np.array([1.0, 0.0, 0.0])
        u = np.array([1.0, 0.7, 0.7])
        s = osqp_tpu.Solver(P=P, q=q, A=A, l=l, u=u, verbose=False)
        res = s.solve()
        assert res.info.status_val == con.OSQP_SOLVED


class TestUnconstrained:
    """m = 0 edge case (unconstrained/generate_problem.py:5-16;
    pri_res short-circuit auxil.c:611-614,717-719)."""

    @pytest.mark.f32
    def test_unconstrained(self):
        d = np.array([0.617022, 0.92032449, 0.20011437, 0.50233257, 0.34675589])
        P = sp.diags(d, format="csc")
        q = np.array([-1.10593508, -1.65451545, -2.3634686, 1.13534535, -1.01701414])
        A = sp.csc_matrix((0, 5))
        s = osqp_tpu.Solver(
            P=P, q=q, A=A, l=np.array([]), u=np.array([]), verbose=False, polish=True
        )
        res = s.solve()
        assert res.info.status_val == con.OSQP_SOLVED
        x_exp = np.array(
            [1.79237542, 1.79775228, 11.81058885, -2.26014678, 2.93293975]
        )
        assert_allclose(res.x, x_exp)
        assert abs(res.info.obj_val - (-19.209752026813277)) < TESTS_TOL
        assert res.info.pri_res == 0.0


class TestNonCvx:
    """non_cvx suite (test_non_cvx.h:30-60)."""

    def problem(self):
        P = sp.triu([[2.0, 5.0], [5.0, 1.0]], format="csc")  # indefinite
        q = np.array([3.0, 4.0])
        A = sp.csc_matrix(
            np.array([[-1.0, 0.0], [0.0, -1.0], [-1.0, 3.0], [2.0, 5.0], [3.0, 4.0]])
        )
        l = -np.inf * np.ones(5)
        u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
        return P, q, A, l, u

    @pytest.mark.nanok

    def test_setup_fails_small_sigma(self):
        """Default sigma=1e-6: factorization detects indefinite P
        (qdldl_interface.c:93-99 -> OSQP_NONCVX_ERROR)."""
        P, q, A, l, u = self.problem()
        with pytest.raises(osqp_tpu.NonConvexError):
            osqp_tpu.Solver(P=P, q=q, A=A, l=l, u=u, verbose=False)

    @pytest.mark.nanok

    def test_solve_diverges_big_sigma(self):
        """sigma=5 passes setup; solve detects divergence -> OSQP_NON_CVX,
        obj = NaN (auxil.c:699-706)."""
        P, q, A, l, u = self.problem()
        s = osqp_tpu.Solver(P=P, q=q, A=A, l=l, u=u, sigma=5.0, verbose=False)
        res = s.solve()
        assert res.info.status_val == con.OSQP_NON_CVX
        assert np.isnan(res.info.obj_val)
        assert np.all(np.isnan(res.x))
