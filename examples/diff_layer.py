"""Learning through the QP: gradient descent on problem data.

The differentiable layer (osqp_tpu.make_qp_layer) lets jax.grad flow
through the solver — here we learn the linear cost q so the QP's
solution matches a target point (the OptNet-style 'QP as a layer'
workflow the reference ecosystem only offers in external packages)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from osqp_tpu import make_qp_layer


def main():
    rng = np.random.default_rng(8)
    B, n, m = 4, 6, 10
    M = rng.standard_normal((B, n, n))
    P = jnp.asarray(np.einsum("bij,bkj->bik", M, M) / n + 0.3 * np.eye(n))
    A = jnp.asarray(rng.standard_normal((B, m, n)))
    x_mid = rng.standard_normal((B, n))
    Ax = np.einsum("bmn,bn->bm", np.asarray(A), x_mid)
    l = jnp.asarray(Ax - 2.0)
    u = jnp.asarray(Ax + 2.0)
    target = jnp.asarray(x_mid * 0.5)

    # f64 so the tight tolerance is actually reachable (the gradient
    # assumes an accurate optimum; f32 would stall at max_iter here)
    layer = make_qp_layer(eps_abs=1e-9, eps_rel=1e-9, dtype="float64")

    def loss(q):
        x = layer(P, q, A, l, u)
        return 0.5 * jnp.mean(jnp.sum((x - target) ** 2, axis=-1))

    q = jnp.zeros((B, n))
    grad = jax.jit(jax.value_and_grad(loss))
    for step in range(40):
        val, g = grad(q)
        q = q - 1.0 * g
        if step % 8 == 0:
            print(f"step {step:2d}: loss = {float(val):.6f}")
    print(f"final loss: {float(loss(q)):.6f}")


if __name__ == "__main__":
    main()
