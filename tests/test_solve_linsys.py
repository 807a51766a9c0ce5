"""solve_linsys suite — ports tests/solve_linsys/generate_problem.py:10-40
and test_solve_linsys.h:12-92, including the z~ recovery transform
(generator lines 33-35: expected[n:] = rhs[n:] + x_nu / rho).
"""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
from numpy.random import Generator, PCG64

import jax.numpy as jnp

from osqp_tpu.linsys import get as get_backend
from conftest import TESTS_TOL


def make_kkt_problem():
    rg = Generator(PCG64(2))
    n, m = 3, 4
    P = sp.random(n, n, density=0.4, format="csc", random_state=rg)
    P = (P @ P.T).tocsc()
    A = sp.random(m, n, density=0.4, format="csc", random_state=rg)
    rho, sigma = 4.0, 1.0
    KKT = sp.vstack(
        [
            sp.hstack([P + sigma * sp.eye(n), A.T]),
            sp.hstack([A, -1.0 / rho * sp.eye(m)]),
        ],
        format="csc",
    )
    rhs = rg.standard_normal(m + n)
    x_exp = spla.splu(KKT.tocsc()).solve(rhs)
    # the split-solution recovery baked into the golden data
    x_exp[n:] = rhs[n:] + x_exp[n:] / rho
    return P, A, rho, sigma, rhs, x_exp, n, m


def _run_backend(name):
    P, A, rho, sigma, rhs, x_exp, n, m = make_kkt_problem()
    Pd = jnp.asarray(P.todense())[None]
    Ad = jnp.asarray(A.todense())[None]
    rho_vec = jnp.full((1, m), rho)
    backend = get_backend(name)
    factor = backend.init(Pd, Ad, jnp.asarray(sigma), rho_vec,
                          cg_tol_fraction=1e-14)
    x_t, z_t = backend.solve(
        factor, Ad, rho_vec, jnp.asarray(rhs[:n])[None], jnp.asarray(rhs[n:])[None]
    )
    np.testing.assert_allclose(np.asarray(x_t[0]), x_exp[:n], atol=TESTS_TOL)
    np.testing.assert_allclose(np.asarray(z_t[0]), x_exp[n:], atol=TESTS_TOL)


def test_solve_kkt_dense_inv():
    _run_backend("dense_inv")


def test_solve_kkt_dense_chol():
    _run_backend("dense_chol")


def test_solve_kkt_lu():
    _run_backend("kkt_lu")


def test_solve_kkt_cg():
    _run_backend("cg")


def test_backend_aliases():
    from osqp_tpu import linsys

    assert linsys.get("qdldl") is linsys.get("dense_inv")
    assert linsys.get("mkl pardiso") is linsys.get("kkt_lu")


def test_form_kkt_matches_scipy_bmat():
    """form_KKT equals scipy bmat golden (update_matrices suite,
    test_update_matrices.h:13-40)."""
    from osqp_tpu.linsys import kkt_lu

    P, A, rho, sigma, *_ , n, m = make_kkt_problem()
    Pd = np.asarray(P.todense())
    Pfull = Pd + np.triu(Pd, 1).T * 0  # P from generator is full symmetric
    K_ref = np.asarray(
        sp.bmat(
            [
                [P + sigma * sp.eye(n), A.T],
                [A, -1.0 / rho * sp.eye(m)],
            ]
        ).todense()
    )
    K = kkt_lu.form_kkt(
        jnp.asarray(Pfull)[None],
        jnp.asarray(A.todense())[None],
        jnp.asarray(sigma),
        jnp.full((1, m), 1.0 / rho),
    )
    np.testing.assert_allclose(np.asarray(K[0]), K_ref, atol=1e-12)
