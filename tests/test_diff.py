"""Differentiable QP layer: gradients match finite differences."""

import numpy as np

import jax
import jax.numpy as jnp

from osqp_tpu.diff import make_qp_layer

from test_batch import random_qps


def _loss_fn(layer, w):
    def loss(P, q, A, l, u):
        x = layer(P, q, A, l, u)
        return jnp.sum(w * x)

    return loss


def test_gradients_match_finite_differences():
    B, n, m = 2, 4, 6
    P, q, A, l, u = random_qps(B, n, m, seed=37)
    P, q, A, l, u = (jnp.asarray(v) for v in (P, q, A, l, u))
    layer = make_qp_layer(eps_abs=1e-10, eps_rel=1e-10)
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((B, n)))
    loss = _loss_fn(layer, w)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(P, q, A, l, u)

    eps = 1e-6
    args = [np.asarray(v, np.float64) for v in (P, q, A, l, u)]
    base_args = [jnp.asarray(a) for a in args]
    rngd = np.random.default_rng(3)
    for ai, name in enumerate(["P", "q", "A", "l", "u"]):
        g = np.asarray(grads[ai])
        # probe a handful of random coordinates
        for _ in range(6):
            pert = np.zeros_like(args[ai])
            flat_idx = rngd.integers(pert[0].size)
            b = rngd.integers(B)
            if name == "P":
                # P is a *symmetric* parameter: perturb (i, j) and (j, i)
                # together; FD then matches g_ij + g_ji.
                i, j = np.unravel_index(flat_idx, (n, n))
                pert[b, i, j] += eps
                an = g[b, i, j] + g[b, j, i]
                if i != j:
                    pert[b, j, i] += eps
                else:
                    an = g[b, i, i]
            else:
                idx = np.unravel_index(flat_idx, pert[0].shape)
                pert[(b,) + idx] += eps
                an = g[(b,) + idx]
            plus = list(base_args)
            plus[ai] = jnp.asarray(args[ai] + pert)
            minus = list(base_args)
            minus[ai] = jnp.asarray(args[ai] - pert)
            fd = (float(loss(*plus)) - float(loss(*minus))) / (2 * eps)
            assert abs(fd - an) < 5e-4 * max(1.0, abs(fd)), (
                name, flat_idx, fd, an,
            )


def test_gradient_symmetry_of_dP():
    B, n, m = 1, 3, 4
    P, q, A, l, u = random_qps(B, n, m, seed=41)
    layer = make_qp_layer(eps_abs=1e-10, eps_rel=1e-10)

    def loss(P_):
        return jnp.sum(layer(P_, q, A, l, u) ** 2)

    dP = np.asarray(jax.grad(loss)(jnp.asarray(P)))
    np.testing.assert_allclose(dP, np.swapaxes(dP, -1, -2), atol=1e-12)


def test_inactive_bounds_get_zero_gradient():
    B, n, m = 1, 3, 4
    P, q, A, l, u = random_qps(B, n, m, seed=43)
    # widen bounds so nothing is active: gradient wrt l, u must vanish
    l = l - 100.0
    u = u + 100.0
    layer = make_qp_layer(eps_abs=1e-10, eps_rel=1e-10)

    def loss(l_, u_):
        return jnp.sum(layer(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A), l_, u_))

    dl, du = jax.grad(loss, argnums=(0, 1))(jnp.asarray(l), jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(dl), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(du), 0.0, atol=1e-12)


def test_layer_works_under_jit():
    """The segmented host driver cannot run under an outer trace;
    solve_batch must fall back to the pure one-program path so the QP
    layer stays usable inside a jitted training step (regression:
    TracerArrayConversionError at np.asarray(c.active))."""
    rng = np.random.default_rng(2)
    n, m = 6, 8
    M = rng.standard_normal((n, n))
    P = (M @ M.T + 0.1 * np.eye(n))[None]
    A = rng.standard_normal((m, n))
    x0 = rng.standard_normal(n)
    l, u = (A @ x0 - 1)[None], (A @ x0 + 1)[None]
    A = A[None]
    layer = make_qp_layer(eps_abs=1e-8, eps_rel=1e-8)

    def loss(q):
        return jnp.sum(layer(P, q[None], A, l, u) ** 2)

    q = jnp.asarray(rng.standard_normal(n))
    g_eager = jax.grad(loss)(q)
    g_jit = jax.jit(jax.grad(loss))(q)
    np.testing.assert_allclose(np.asarray(g_jit), np.asarray(g_eager),
                               atol=1e-10)
