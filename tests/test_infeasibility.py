"""primal_infeasibility and primal_dual_infeasibility suites.

Ports tests/primal_infeasibility/generate_problem.py:21-35 and
tests/primal_dual_infeasibility/generate_problem.py:5-36 +
test_primal_dual_infeasibility.h:9-231.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.nanok  # certificates / NaN-filled solutions by design
import scipy.sparse as sp
from numpy.random import Generator, PCG64

import osqp_tpu
from osqp_tpu import constants as con
from conftest import TESTS_TOL, assert_allclose


@pytest.mark.f32
def test_primal_infeasible_qp():
    """Random 50x150 QP made infeasible by a contradictory duplicated row
    -> OSQP_PRIMAL_INFEASIBLE."""
    rg = Generator(PCG64(2))
    n, m = 50, 150
    Pt = sp.random(n, n, random_state=rg)
    P = (Pt.T @ Pt + sp.eye(n)).tocsc()
    q = rg.standard_normal(n)
    A = sp.random(m, n, random_state=rg).tolil()
    u = 3 + rg.standard_normal(m)
    l = -3 + rg.standard_normal(m)

    # contradictory duplicate row (generator lines 22-24)
    A[n // 2, :] = A[n // 2 + 1, :]
    l[n // 2] = u[n // 2 + 1] + 10 * rg.random()
    u[n // 2] = l[n // 2] + 0.5
    A = A.tocsc()

    s = osqp_tpu.Solver(P=sp.triu(P, format="csc"), q=q, A=A, l=l, u=u, verbose=False)
    res = s.solve()
    assert res.info.status_val == con.OSQP_PRIMAL_INFEASIBLE
    assert np.all(np.isnan(res.x))
    # OSQP_INFTY (1e30) is not exactly representable in f32, so the f32
    # device leg sees it through a float cast
    assert np.float32(res.info.obj_val) == np.float32(con.OSQP_INFTY)
    # certificate: normalized, and valid: A' v ~ 0, u'max(v,0)+l'min(v,0) < 0
    v = res.prim_inf_cert
    assert np.max(np.abs(v)) == 1.0
    assert np.max(np.abs(A.T @ v)) < 1e-3
    support = u @ np.maximum(v, 0) + l @ np.minimum(v, 0)
    assert support < 0


class TestPrimalDualInfeasibility:
    """4 variants of one QP (generate_problem.py:5-36)."""

    P = sp.diags([1.0, 0.0], format="csc")
    q = np.array([1.0, -1.0])
    A12 = sp.csc_matrix([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    A34 = sp.csc_matrix([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([0.0, 1.0, 1.0])

    def solve(self, A, u, **kw):
        kw.setdefault("verbose", False)
        kw.setdefault("polish", True)
        s = osqp_tpu.Solver(P=self.P, q=self.q, A=A, l=self.l, u=u, **kw)
        return s.solve()

    def test_optimal(self):
        res = self.solve(self.A12, np.array([5.0, 3.0, 3.0]))
        assert res.info.status_val == con.OSQP_SOLVED
        assert_allclose(res.x, [1.0, 3.0])
        assert_allclose(res.y, [0.0, -2.0, 1.0])
        assert abs(res.info.obj_val - (-1.5)) < TESTS_TOL

    @pytest.mark.f32
    def test_primal_infeasible(self):
        res = self.solve(self.A12, np.array([0.0, 3.0, 3.0]))
        assert res.info.status_val == con.OSQP_PRIMAL_INFEASIBLE

    @pytest.mark.f32
    def test_dual_infeasible(self):
        res = self.solve(self.A34, np.array([2.0, 3.0, np.inf]))
        assert res.info.status_val == con.OSQP_DUAL_INFEASIBLE
        # certificate is a direction of unbounded descent
        d = res.dual_inf_cert
        assert np.max(np.abs(d)) == 1.0
        assert self.q @ d < 0

    def test_primal_and_dual_infeasible(self):
        """Both infeasible -> reference expects PRIMAL_INFEASIBLE."""
        res = self.solve(self.A34, np.array([0.0, 3.0, np.inf]))
        assert res.info.status_val in (
            con.OSQP_PRIMAL_INFEASIBLE,
            con.OSQP_DUAL_INFEASIBLE,
        )
        assert res.info.status_val == con.OSQP_PRIMAL_INFEASIBLE
