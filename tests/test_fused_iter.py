"""Fused Pallas ADMM iteration == the reference XLA iteration path.

Runs the kernel in interpreter mode on CPU and checks exact agreement
with admm_step + masking (the two paths must be interchangeable — the
TPU run flips between them based on OSQP_TPU_FUSED)."""

import numpy as np

import jax.numpy as jnp

from osqp_tpu.admm import admm_step, set_rho_state
from osqp_tpu.linalg import bwhere
from osqp_tpu.linsys import dense_inv
from osqp_tpu.ops.fused_iter import fused_iteration
from osqp_tpu.types import DynSettings, Iterates, QPData

from conftest import assert_allclose


def test_fused_matches_xla_step():
    rng = np.random.default_rng(3)
    B, n, m = 4, 10, 14
    dt = jnp.float32
    M = rng.standard_normal((B, n, n))
    P = jnp.asarray(np.einsum("bij,bkj->bik", M, M) / n + 0.3 * np.eye(n), dt)
    q = jnp.asarray(rng.standard_normal((B, n)), dt)
    A = jnp.asarray(rng.standard_normal((B, m, n)), dt)
    l = jnp.asarray(rng.standard_normal((B, m)) - 2.0, dt)
    u = jnp.asarray(l + 3.0, dt)
    data = QPData(P=P, q=q, A=A, l=l, u=u)
    dyn = DynSettings.make(dt)
    rs = set_rho_state(data, jnp.full((B,), 0.1, dt))
    factor = dense_inv.init(P, A, dyn.sigma, rs.rho_vec)
    it = Iterates(
        x=jnp.asarray(rng.standard_normal((B, n)), dt),
        z=jnp.asarray(rng.standard_normal((B, m)), dt),
        y=jnp.asarray(rng.standard_normal((B, m)), dt),
    )
    active = jnp.asarray([True, False, True, True])

    it_ref, dx_ref, dy_ref = admm_step(dense_inv, factor, data, dyn, rs, it)
    it_ref = bwhere(active, it_ref, it)

    xo, zo, yo, dx, dy = fused_iteration(
        factor, A, dyn.sigma, dyn.alpha, rs.rho_vec, rs.rho_inv_vec,
        it.x, it.z, it.y, q, l, u, active, interpret=True,
    )
    assert_allclose(xo, it_ref.x, tol=1e-5)
    assert_allclose(zo, it_ref.z, tol=1e-5)
    assert_allclose(yo, it_ref.y, tol=1e-5)
    assert_allclose(dx, dx_ref, tol=1e-5)
    assert_allclose(dy, dy_ref, tol=1e-5)
    # Frozen instance keeps its iterates exactly
    assert_allclose(xo[1], it.x[1], tol=0)
    assert_allclose(zo[1], it.z[1], tol=0)
    assert_allclose(yo[1], it.y[1], tol=0)
