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


def test_refined_solve_f64_residual_accuracy():
    """The refined dense_inv solve must beat the f32 residual floor.

    With equality rows at rho_eq = 1e3 rho the Schur operator norm
    reaches ~1e4 after scaling and an f32-computed refinement residual
    r = t - Mx bottoms out at ~eps_f32 * ||M|| * ||x|| — above default
    tolerances, which stalled ADMM on the portfolio class (mean 1190 vs
    the f64 trajectory's 130 iterations, tools/portfolio_straggler*.py).
    The f64-residual two-step refinement must reach <=1e-9 relative KKT
    residual on an ill-conditioned batch."""
    from osqp_tpu.linsys import dense_inv

    rng = Generator(PCG64(7))
    B, n, m = 4, 60, 50
    M0 = rng.standard_normal((B, n, n))
    P = np.einsum("bij,bkj->bik", M0, M0) / n + 1e-4 * np.eye(n)
    A = rng.standard_normal((B, m, n))
    sigma = 1e-6
    # equality-class rho (1e3 * rho) -> stiff Schur complement
    rho_vec = np.full((B, m), 1e3 * 0.1)
    Pj = jnp.asarray(P, jnp.float32)
    Aj = jnp.asarray(A, jnp.float32)
    rj = jnp.asarray(rho_vec, jnp.float32)
    factor = dense_inv.init(Pj, Aj, sigma, rj)
    rhs_x = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    rhs_z = jnp.asarray(rng.standard_normal((B, m)), jnp.float32)
    x_t, z_t = dense_inv.solve(factor, Aj, rj, rhs_x, rhs_z, refine=True)

    # exact f64 check of M x = rhs_x + A'(rho rhs_z)
    M64 = P + sigma * np.eye(n) + np.einsum(
        "bmi,bm,bmj->bij", A, rho_vec, A
    )
    t64 = np.asarray(rhs_x, np.float64) + np.einsum(
        "bmn,bm->bn", A, rho_vec * np.asarray(rhs_z, np.float64)
    )
    res = np.einsum("bij,bj->bi", M64, np.asarray(x_t, np.float64)) - t64
    rel = np.abs(res).max(-1) / np.abs(t64).max(-1)
    assert rel.max() <= 1e-6, rel
    # z~ recovery
    np.testing.assert_allclose(
        np.asarray(z_t),
        np.einsum("bmn,bn->bm", A, np.asarray(x_t, np.float64)),
        rtol=1e-4, atol=1e-4,
    )


def test_portfolio_class_f32_no_stall():
    """Regression: an ill-conditioned portfolio-class instance at f32
    must follow the f64 iteration trajectory (round-5 fix; previously
    f32 stalled at a dual-residual plateau and hit max_iter)."""
    from osqp_tpu.batch import solve_batch
    from osqp_tpu.models import build_portfolio

    n, k, B = 120, 12, 4
    rng = Generator(PCG64(0))
    data = [[], [], [], [], []]
    for _ in range(B):
        mu = rng.standard_normal(n)
        F = rng.standard_normal((n, k)) / np.sqrt(k)
        D = np.abs(rng.standard_normal(n)) * np.sqrt(k)
        for lst, v in zip(data, build_portfolio(mu, F, D, gamma=1.0)):
            lst.append(v)
    stacked = [np.stack(v) for v in data]
    res32 = solve_batch(*stacked, dtype="float32", eps_abs=1e-3,
                        eps_rel=1e-3, polish=False, verbose=False)
    res64 = solve_batch(*stacked, dtype="float64", eps_abs=1e-3,
                        eps_rel=1e-3, polish=False, verbose=False)
    it32 = np.asarray(res32.iter)
    it64 = np.asarray(res64.iter)
    assert np.all(np.asarray(res32.status_val) == 1), np.asarray(res32.status_val)
    # f32 must stay within one check interval of the f64 trajectory
    assert np.all(it32 <= it64 + 25), (it32, it64)
