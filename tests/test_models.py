"""Problem-family builders (reference docs/examples/*.rst) solve correctly.

Each model is verified by first-order KKT optimality of the returned
solution on the *original* QP data (stationarity + feasibility +
complementary slackness), not just solver status — the same level of
assurance as the reference's golden-value tests, without baking in
solver-specific constants.
"""

import numpy as np

from osqp_tpu.models import (
    build_huber,
    build_lasso,
    build_least_squares,
    build_portfolio,
    build_svm,
)
from osqp_tpu.solver import Solver

from conftest import assert_allclose


def _solve(P, q, A, l, u, **kw):
    s = Solver(
        P, q, A, l, u,
        polish=True, eps_abs=1e-6, eps_rel=1e-6, verbose=False, **kw,
    )
    r = s.solve()
    assert r.info.status == "solved", r.info.status
    return r


def _check_kkt(P, q, A, l, u, x, y, tol=1e-4):
    """Stationarity, primal feasibility, dual signs, complementary
    slackness of (x, y) for the QP (docs/solver/index.rst optimality)."""
    P = np.asarray(P)
    A = np.asarray(A)
    r_stat = P @ x + np.asarray(q) + A.T @ y
    assert np.max(np.abs(r_stat)) < tol, np.max(np.abs(r_stat))
    Ax = A @ x
    assert np.all(Ax >= np.asarray(l) - tol)
    assert np.all(Ax <= np.asarray(u) + tol)
    # y_i > 0 only where upper bound active; y_i < 0 only where lower active
    up_gap = np.asarray(u) - Ax
    lo_gap = Ax - np.asarray(l)
    assert np.all(up_gap[y > tol] < 1e-2)
    assert np.all(lo_gap[y < -tol] < 1e-2)


def test_lasso():
    rng = np.random.default_rng(5)
    m, n = 30, 10
    Ad = rng.standard_normal((m, n))
    x_true = np.zeros(n)
    x_true[:3] = rng.standard_normal(3)
    b = Ad @ x_true + 0.01 * rng.standard_normal(m)
    gamma = 0.2
    P, q, A, l, u = build_lasso(Ad, b, gamma)
    r = _solve(P, q, A, l, u)
    _check_kkt(P, q, A, l, u, r.x, r.y)
    x = r.x[:n]
    # lasso objective at solution beats the zero vector and the LS solution
    obj = lambda v: 0.5 * np.sum((Ad @ v - b) ** 2) + gamma * np.sum(np.abs(v))
    assert obj(x) <= obj(np.zeros(n)) + 1e-6
    assert obj(x) <= obj(np.linalg.lstsq(Ad, b, rcond=None)[0]) + 1e-6


def test_lasso_large_gamma_zero_solution():
    rng = np.random.default_rng(6)
    Ad = rng.standard_normal((20, 8))
    b = rng.standard_normal(20)
    # gamma > ||Ad' b||_inf forces x* = 0 (lasso optimality condition)
    gamma = 1.5 * np.max(np.abs(Ad.T @ b))
    P, q, A, l, u = build_lasso(Ad, b, gamma)
    r = _solve(P, q, A, l, u)
    assert_allclose(r.x[:8], np.zeros(8), tol=1e-5)


def test_huber():
    rng = np.random.default_rng(7)
    m, n = 40, 6
    Ad = rng.standard_normal((m, n))
    x_true = rng.standard_normal(n)
    b = Ad @ x_true
    b[:4] += 10.0  # gross outliers
    P, q, A, l, u = build_huber(Ad, b, M=1.0)
    r = _solve(P, q, A, l, u)
    _check_kkt(P, q, A, l, u, r.x, r.y)
    # Huber regression shrugs off the outliers; LS does not.
    x_h = r.x[:n]
    x_ls = np.linalg.lstsq(Ad, b, rcond=None)[0]
    assert np.linalg.norm(x_h - x_true) < 0.5 * np.linalg.norm(x_ls - x_true)


def test_svm():
    rng = np.random.default_rng(8)
    m, n = 60, 4
    w_true = rng.standard_normal(n)
    Ad = rng.standard_normal((m, n))
    b = np.sign(Ad @ w_true)
    b[b == 0] = 1.0
    P, q, A, l, u = build_svm(Ad, b, lam=1.0)
    r = _solve(P, q, A, l, u)
    _check_kkt(P, q, A, l, u, r.x, r.y)
    w = r.x[:n]
    # Separable data: the learned hyperplane classifies well
    acc = np.mean(np.sign(Ad @ w) == b)
    assert acc > 0.95


def test_portfolio():
    rng = np.random.default_rng(9)
    n, k = 20, 4
    F = rng.standard_normal((n, k)) * 0.3
    D_diag = np.abs(rng.standard_normal(n)) * 0.1 + 0.05
    mu = rng.standard_normal(n) * 0.1
    P, q, A, l, u = build_portfolio(mu, F, D_diag, gamma=1.0)
    r = _solve(P, q, A, l, u)
    _check_kkt(P, q, A, l, u, r.x, r.y)
    x = r.x[:n]
    assert_allclose(np.sum(x), 1.0, tol=1e-5)
    assert np.all(x >= -1e-6)
    # y really is F'x
    assert_allclose(r.x[n:], F.T @ x, tol=1e-5)


def test_least_squares():
    rng = np.random.default_rng(10)
    m, n = 25, 8
    Ad = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    P, q, A, l, u = build_least_squares(Ad, b)
    r = _solve(P, q, A, l, u)
    _check_kkt(P, q, A, l, u, r.x, r.y)
    x = r.x[:n]
    assert np.all(x >= -1e-6) and np.all(x <= 1.0 + 1e-6)
    # Optimal over the box: no better than projected-gradient stationarity
    g = Ad.T @ (Ad @ x - b)
    proj = np.clip(x - g, 0.0, 1.0)
    assert np.max(np.abs(proj - x)) < 1e-4
