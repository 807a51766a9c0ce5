"""lin_alg suite (ports tests/lin_alg/test_lin_alg.h vs NumPy) and Ruiz
scaling unit tests (scaling.c:44-156 invariants)."""

import numpy as np
from numpy.random import Generator, PCG64

import jax.numpy as jnp

from osqp_tpu import linalg
from osqp_tpu.scaling import limit_scaling, scale_data
from osqp_tpu.types import QPData
from osqp_tpu.constants import MIN_SCALING, MAX_SCALING


rg = Generator(PCG64(2))


def rnd(*shape):
    return rg.standard_normal(shape)


class TestLinAlg:
    def test_norm_inf(self):
        v = rnd(3, 7)
        np.testing.assert_allclose(
            np.asarray(linalg.norm_inf(jnp.asarray(v))),
            np.max(np.abs(v), axis=-1),
        )

    def test_norm_inf_empty(self):
        v = jnp.zeros((3, 0))
        np.testing.assert_allclose(np.asarray(linalg.norm_inf(v)), np.zeros(3))

    def test_scaled_norm_inf(self):
        v, s = rnd(2, 5), np.abs(rnd(2, 5))
        np.testing.assert_allclose(
            np.asarray(linalg.scaled_norm_inf(jnp.asarray(s), jnp.asarray(v))),
            np.max(np.abs(s * v), axis=-1),
        )

    def test_mat_vec_and_tpose(self):
        A, x, y = rnd(2, 4, 3), rnd(2, 3), rnd(2, 4)
        np.testing.assert_allclose(
            np.asarray(linalg.mat_vec(jnp.asarray(A), jnp.asarray(x))),
            np.einsum("bmn,bn->bm", A, x),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(linalg.mat_tvec(jnp.asarray(A), jnp.asarray(y))),
            np.einsum("bmn,bm->bn", A, y),
            atol=1e-12,
        )

    def test_quad_form(self):
        """quad_form on dense symmetric P vs the reference triu convention
        (lin_alg.c:387-413)."""
        M = rnd(3, 3)
        Pfull = M @ M.T
        x = rnd(3)
        qf = np.asarray(
            linalg.quad_form(jnp.asarray(Pfull)[None], jnp.asarray(x)[None])
        )[0]
        np.testing.assert_allclose(qf, 0.5 * x @ Pfull @ x, atol=1e-12)


class TestScaling:
    def test_limit_scaling(self):
        v = jnp.asarray([0.0, 1e-5, 0.5, 1e5])
        out = np.asarray(limit_scaling(v))
        np.testing.assert_allclose(out, [1.0, 1.0, 0.5, MAX_SCALING])

    def _problem(self, B=2, n=6, m=9):
        M = rnd(B, n, n)
        P = M @ np.swapaxes(M, -1, -2)
        A = rnd(B, m, n) * np.exp(rnd(B, m, n))  # badly scaled
        q = rnd(B, n)
        l = -np.abs(rnd(B, m)) * 10
        u = np.abs(rnd(B, m)) * 10
        return QPData(
            P=jnp.asarray(P),
            q=jnp.asarray(q),
            A=jnp.asarray(A),
            l=jnp.asarray(l),
            u=jnp.asarray(u),
        )

    def test_ruiz_equilibrates(self):
        """After 10 sweeps the scaled KKT is equilibrated: A row norms ~1
        (untouched by cost normalization) and joint column norms bounded
        by ~1 (P columns may sit below 1 because the cost scalar c_temp
        rescales P *after* equilibration, scaling.c:110-141)."""
        data = self._problem()
        scaled, scl = scale_data(data, 10)
        Pn = np.max(np.abs(np.asarray(scaled.P)), axis=-2)
        An_col = np.max(np.abs(np.asarray(scaled.A)), axis=-2)
        d = np.maximum(Pn, An_col)
        e = np.max(np.abs(np.asarray(scaled.A)), axis=-1)
        assert np.all(np.abs(e - 1.0) < 0.1)
        assert np.all(d < 1.1)
        # orders-of-magnitude spread is gone (input had exp-scaled A)
        assert np.all(d > 1e-3)

    def test_scaling_roundtrip(self):
        """scaled = c * D (P, q) D / E A D etc. — reconstruct original."""
        data = self._problem()
        scaled, scl = scale_data(data, 10)
        c = np.asarray(scl.c)[:, None, None]
        D = np.asarray(scl.D)
        E = np.asarray(scl.E)
        P_rec = np.asarray(scaled.P) / c / D[:, :, None] / D[:, None, :]
        np.testing.assert_allclose(P_rec, np.asarray(data.P), rtol=1e-10)
        A_rec = np.asarray(scaled.A) / E[:, :, None] / D[:, None, :]
        np.testing.assert_allclose(A_rec, np.asarray(data.A), rtol=1e-10)
        q_rec = np.asarray(scaled.q) / np.asarray(scl.c)[:, None] / D
        np.testing.assert_allclose(q_rec, np.asarray(data.q), rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(scaled.l) / E, np.asarray(data.l), rtol=1e-10
        )

    def test_scale_bounds_within_limits(self):
        data = self._problem()
        _, scl = scale_data(data, 10)
        for v in (scl.D, scl.E, scl.c):
            a = np.asarray(v)
            assert np.all(a > 0)
