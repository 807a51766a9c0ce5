"""Batched-solve consistency: batched solve == loop of single solves
(per SURVEY §4 "add what the reference cannot have"), plus the sharded
multi-device path (8 virtual CPU devices)."""

import numpy as np
import pytest
from numpy.random import Generator, PCG64

import jax

import osqp_tpu
from conftest import F32_DEVICE, TESTS_TOL
from osqp_tpu import constants as con
from osqp_tpu.batch import solve_batch


def random_qps(B, n, m, seed=7):
    """Random strictly-convex box-constrained QPs."""
    rg = Generator(PCG64(seed))
    M = rg.standard_normal((B, n, n))
    P = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    q = rg.standard_normal((B, n))
    A = rg.standard_normal((B, m, n))
    xr = rg.standard_normal((B, n))
    Ax = np.einsum("bmn,bn->bm", A, xr)
    l = Ax - np.abs(rg.standard_normal((B, m))) - 0.1
    u = Ax + np.abs(rg.standard_normal((B, m))) + 0.1
    return P, q, A, l, u


class TestBatch:
    @pytest.mark.f32
    def test_batch_equals_single(self):
        B, n, m = 5, 8, 12
        P, q, A, l, u = random_qps(B, n, m)
        res = solve_batch(P, q, A, l, u, verbose=False)
        assert np.all(np.asarray(res.status_val) == con.OSQP_SOLVED)

        for i in range(B):
            s = osqp_tpu.Solver(P=P[i], q=q[i], A=A[i], l=l[i], u=u[i], verbose=False)
            ri = s.solve()
            # bit-identical per instance on the f64/CPU suite (same
            # jitted math, masked batching); on the f32 device leg XLA
            # compiles B=5 and B=1 differently, so equality holds only
            # to f32 accuracy there.
            assert int(res.iter[i]) == ri.info.iter
            atol = TESTS_TOL if F32_DEVICE else 1e-10
            np.testing.assert_allclose(np.asarray(res.x[i]), ri.x, atol=atol)
            np.testing.assert_allclose(np.asarray(res.y[i]), ri.y, atol=atol)

    @pytest.mark.nanok

    def test_batch_mixed_statuses(self):
        """A batch mixing solvable and primal-infeasible instances."""
        B, n, m = 4, 6, 8
        P, q, A, l, u = random_qps(B, n, m, seed=3)
        # make instance 2 infeasible: duplicate row with disjoint bounds
        A[2, 1] = A[2, 0]
        l[2, 0], u[2, 0] = 1.0, 2.0
        l[2, 1], u[2, 1] = 5.0, 6.0
        res = solve_batch(P, q, A, l, u, verbose=False)
        sv = np.asarray(res.status_val)
        assert sv[2] == con.OSQP_PRIMAL_INFEASIBLE
        assert np.all(sv[np.arange(B) != 2] == con.OSQP_SOLVED)
        assert np.all(np.isnan(np.asarray(res.x[2])))
        assert not np.any(np.isnan(np.asarray(res.x[0])))

    @pytest.mark.f32
    def test_batch_polish(self):
        B, n, m = 3, 8, 12
        P, q, A, l, u = random_qps(B, n, m, seed=11)
        res = solve_batch(P, q, A, l, u, polish=True, verbose=False)
        assert np.all(np.asarray(res.status_polish) == 1)
        # polished solutions satisfy KKT tightly (f32: to f32 accuracy)
        tight = 1e-5 if F32_DEVICE else 1e-9
        assert np.all(np.asarray(res.pri_res) < tight)
        assert np.all(np.asarray(res.dua_res) < tight)

    @pytest.mark.f32
    def test_batch_warm_start(self):
        B, n, m = 3, 8, 12
        P, q, A, l, u = random_qps(B, n, m, seed=5)
        r1 = solve_batch(P, q, A, l, u, verbose=False, check_termination=1)
        r2 = solve_batch(
            P, q, A, l, u,
            x0=np.asarray(r1.x), y0=np.asarray(r1.y),
            polish=False, check_termination=1,
        )
        assert np.all(np.asarray(r2.iter) <= np.asarray(r1.iter))


class TestSharded:
    def test_sharded_equals_local(self):
        from osqp_tpu.parallel import make_mesh, solve_batch_sharded

        assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
        B, n, m = 16, 8, 12
        P, q, A, l, u = random_qps(B, n, m, seed=9)
        res_local = solve_batch(P, q, A, l, u, verbose=False)
        mesh = make_mesh()
        res_shard = solve_batch_sharded(P, q, A, l, u, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(res_shard.x), np.asarray(res_local.x), atol=1e-10
        )
        np.testing.assert_array_equal(
            np.asarray(res_shard.status_val), np.asarray(res_local.status_val)
        )
        np.testing.assert_array_equal(
            np.asarray(res_shard.iter), np.asarray(res_local.iter)
        )


def test_y_only_warm_start_honored():
    """osqp_warm_start allows either side alone (osqp.c:967-1010);
    regression: solve_batch silently ignored y0 without x0."""
    P, q, A, l, u = random_qps(4, 20, 30, seed=9)
    kw = dict(polish=False, verbose=False, check_termination=1)
    r_cold = solve_batch(P, q, A, l, u, **kw)
    r_warm = solve_batch(P, q, A, l, u, y0=r_cold.y, **kw)
    assert np.all(np.asarray(r_warm.iter) <= np.asarray(r_cold.iter))
    assert float(np.asarray(r_warm.iter).mean()) < float(
        np.asarray(r_cold.iter).mean()
    )
