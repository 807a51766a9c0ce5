"""Intra-problem sharding: one QP row-sharded across the 8-device
virtual mesh equals the unsharded solve."""

import numpy as np
import pytest

import jax

from osqp_tpu import constants as con
from osqp_tpu.batch import solve_batch
from osqp_tpu.parallel import make_mesh, solve_single_sharded

from conftest import assert_allclose


def _qp(n=24, m=50, seed=21):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    P = M @ M.T / n + 0.2 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    x0 = rng.standard_normal(n)
    l = A @ x0 - 1.0
    u = A @ x0 + 1.0
    return P, q, A, l, u


def test_sharded_single_matches_unsharded():
    assert len(jax.devices()) >= 8
    P, q, A, l, u = _qp(m=50)  # 50 rows -> padded to 56 over 8 devices
    mesh = make_mesh(8)
    res_s = solve_single_sharded(P, q, A, l, u, mesh=mesh, verbose=False)
    res_p = solve_batch(
        P[None], q[None], A[None], l[None], u[None],
        linsys_solver="cg", verbose=False,
    )
    assert int(np.asarray(res_s.status_val)[0]) == con.OSQP_SOLVED
    assert_allclose(res_s.x[0], res_p.x[0], tol=1e-6)
    assert_allclose(res_s.y[0], res_p.y[0], tol=1e-6)
    assert res_s.y.shape == (1, 50)  # padding rows stripped


def test_sharded_single_rejects_polish_and_direct_backends():
    P, q, A, l, u = _qp()
    with pytest.raises(ValueError):
        solve_single_sharded(P, q, A, l, u, polish=True)
    with pytest.raises(ValueError):
        solve_single_sharded(P, q, A, l, u, linsys_solver="dense_inv")
