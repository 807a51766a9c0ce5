"""Property test: across many random QPs (feasible boxes, equality rows,
loose rows, one-sided rows), polished solutions satisfy the first-order
KKT conditions of the ORIGINAL problem data — solver-independent ground
truth, beyond golden-value comparisons."""

import numpy as np
import pytest

import osqp_tpu


def _random_mixed_qp(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 12))
    m = int(rng.integers(2, 20))
    M = rng.standard_normal((n, n))
    P = M @ M.T / n + 0.1 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    x0 = rng.standard_normal(n)
    Ax = A @ x0
    l = Ax - np.abs(rng.standard_normal(m)) - 0.05
    u = Ax + np.abs(rng.standard_normal(m)) + 0.05
    # Sprinkle structure: equality, loose and one-sided rows
    for i in range(m):
        r = rng.random()
        if r < 0.2:
            l[i] = u[i] = Ax[i]  # equality
        elif r < 0.35:
            l[i], u[i] = -np.inf, np.inf  # loose
        elif r < 0.5:
            l[i] = -np.inf  # upper-only
        elif r < 0.6:
            u[i] = np.inf  # lower-only
    return P, q, A, l, u


@pytest.mark.parametrize("seed", range(47, 59))
def test_random_qp_kkt(seed):
    P, q, A, l, u = _random_mixed_qp(seed)
    s = osqp_tpu.Solver(
        P=P, q=q, A=A, l=l, u=u,
        polish=True, eps_abs=1e-7, eps_rel=1e-7, verbose=False,
    )
    r = s.solve()
    assert r.info.status == "solved"
    x, y = r.x, r.y
    tol = 1e-4
    # Stationarity
    assert np.max(np.abs(P @ x + q + A.T @ y)) < tol
    # Primal feasibility
    Ax = A @ x
    assert np.all(Ax >= np.where(np.isinf(l), -np.inf, l) - tol)
    assert np.all(Ax <= np.where(np.isinf(u), np.inf, u) + tol)
    # Dual signs + complementary slackness
    for i in range(A.shape[0]):
        if y[i] > tol:
            assert u[i] - Ax[i] < 1e-3, (i, y[i], u[i] - Ax[i])
        elif y[i] < -tol:
            assert Ax[i] - l[i] < 1e-3, (i, y[i], Ax[i] - l[i])
