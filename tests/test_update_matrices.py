"""update_matrices suite — ports tests/update_matrices/generate_problem.py
(seeded Generator(PCG64(2)), exact call sequence) and
test_update_matrices.h:13-80.  Golden solutions are the hardcoded values
from the generator (lines 85-105).
"""

import numpy as np
import scipy.sparse as sp
from numpy.random import Generator, PCG64

import osqp_tpu
from osqp_tpu import constants as con
from conftest import TESTS_TOL, assert_allclose


def generate():
    """Exact reproduction of the generator's RNG call sequence."""
    rg = Generator(PCG64(2))
    n, m, p = 5, 8, 0.7
    A = sp.random(m, n, density=p, format="csc", random_state=rg)
    P0 = sp.random(n, n, density=p, random_state=rg)
    P = (P0 @ P0.T).tocsc() + sp.eye(n, format="csc")
    Pu = sp.triu(P, format="csc")

    A_new = A.copy()
    A_new.data += rg.standard_normal(A_new.nnz)
    Pu_new = Pu.copy()
    Pu_new.data += 0.1 * rg.standard_normal(Pu_new.nnz)

    q = rg.standard_normal(n)
    l = -30 + rg.standard_normal(m)
    u = 30 + rg.standard_normal(m)
    return Pu, q, A, l, u, Pu_new, A_new


X_GOLD = np.array(
    [-4.61725223e-01, 7.97298788e-01, 5.55470173e-04, 3.37603740e-01, -1.14060693e00]
)
OBJ_GOLD = -1.885431747787806
X_P_NEW = np.array([-0.48845963, 0.70997599, -0.09017696, 0.33176037, -1.01867464])
OBJ_P_NEW = -1.7649689689774013


def make(Pu, q, A, l, u):
    return osqp_tpu.Solver(
        P=Pu, q=q, A=A, l=l, u=u, verbose=False, polish=True, eps_abs=1e-5,
        eps_rel=1e-5,
    )


def test_solve_initial():
    Pu, q, A, l, u, *_ = generate()
    res = make(Pu, q, A, l, u).solve()
    assert res.info.status_val == con.OSQP_SOLVED
    assert_allclose(res.x, X_GOLD)
    assert_allclose(res.y, np.zeros(8))
    assert abs(res.info.obj_val - OBJ_GOLD) < TESTS_TOL


def test_update_P():
    Pu, q, A, l, u, Pu_new, A_new = generate()
    s = make(Pu, q, A, l, u)
    s.solve()
    s.update_P(Px=Pu_new.data, Px_idx=None)
    res = s.solve()
    assert res.info.status_val == con.OSQP_SOLVED
    assert_allclose(res.x, X_P_NEW)
    assert abs(res.info.obj_val - OBJ_P_NEW) < TESTS_TOL


def test_update_P_indexed():
    """Partial indexed update equals full update (osqp.c:1052-1062)."""
    Pu, q, A, l, u, Pu_new, A_new = generate()
    s = make(Pu, q, A, l, u)
    idx = np.arange(Pu.nnz)
    s.update_P(Px=Pu_new.data[idx], Px_idx=idx)
    res = s.solve()
    assert_allclose(res.x, X_P_NEW)


def test_update_A():
    Pu, q, A, l, u, Pu_new, A_new = generate()
    s = make(Pu, q, A, l, u)
    s.update_A(Ax=A_new.data, Ax_idx=None)
    res = s.solve()
    assert res.info.status_val == con.OSQP_SOLVED
    # golden: x unchanged (constraints stay inactive), same objective
    assert_allclose(res.x, X_GOLD)
    assert abs(res.info.obj_val - (-1.8854317477878062)) < TESTS_TOL


def test_update_P_A():
    Pu, q, A, l, u, Pu_new, A_new = generate()
    s = make(Pu, q, A, l, u)
    s.update_P_A(Px=Pu_new.data, Ax=A_new.data)
    res = s.solve()
    assert res.info.status_val == con.OSQP_SOLVED
    assert_allclose(res.x, X_P_NEW)
    assert abs(res.info.obj_val - (-1.764968968977401)) < TESTS_TOL


def test_update_equals_fresh_setup():
    """update_P/update_A in place == fresh setup with the new matrices
    (test_update_matrices.h KKT-update equivalence)."""
    Pu, q, A, l, u, Pu_new, A_new = generate()
    s = make(Pu, q, A, l, u)
    s.update_P_A(Px=Pu_new.data, Ax=A_new.data)
    fresh = make(Pu_new, q, A_new, l, u)
    np.testing.assert_allclose(
        np.asarray(s.data.P), np.asarray(fresh.data.P), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s.data.A), np.asarray(fresh.data.A), atol=1e-12
    )
    r1, r2 = s.solve(), fresh.solve()
    assert r1.info.iter == r2.info.iter


def test_update_P_wrong_nnz_rejected():
    Pu, q, A, l, u, Pu_new, _ = generate()
    s = make(Pu, q, A, l, u)
    import pytest

    with pytest.raises(osqp_tpu.OSQPError):
        s.update_P(Px=np.ones(Pu.nnz + 3), Px_idx=None)
    with pytest.raises(osqp_tpu.OSQPError):
        s.update_P(Px=np.ones(2), Px_idx=np.array([0, Pu.nnz + 5]))


def test_combined_update_method():
    """osqp-python-style m.update(q=..., l=..., Px=..., Ax=...) combined
    dispatch equals the individual update calls."""
    import pytest

    Pu, q, A, l, u, Pu_new, A_new = generate()
    s1 = make(Pu, q, A, l, u)
    q2 = q + 0.1
    l2 = l - 0.5
    s1.update(q=q2, l=l2, Px=Pu_new.data, Ax=A_new.data)
    r1 = s1.solve()

    s2 = make(Pu, q, A, l, u)
    s2.update_lin_cost(q2)
    s2.update_bounds(l=l2)
    s2.update_P_A(Px=Pu_new.data, Ax=A_new.data)
    r2 = s2.solve()

    assert r1.info.iter == r2.info.iter
    assert_allclose(r1.x, r2.x, tol=1e-12)

    with pytest.raises(osqp_tpu.OSQPError):
        s1.update(bogus=1.0)


def test_update_sequence_fuzz_equals_fresh_setup():
    """Randomized property test (round 5): an arbitrary SEQUENCE of
    parametric updates (q, bounds, P values, A values) is equivalent to
    a fresh setup with the final data — identical scaled data, matching
    solutions (the updated solver stays warm-started, so iteration
    counts may differ; solutions must agree at tolerance).
    Five seeds x mixed sizes; generalizes the single-seed
    golden equivalence above (osqp.c:765-1279 semantics: each update
    unscales, writes, rescales from scratch)."""
    for seed in range(5):
        rg = Generator(PCG64(seed))
        n = int(rg.integers(4, 12))
        m = int(rg.integers(4, 16))
        A = sp.random(m, n, density=0.7, format="csc", random_state=rg)
        P0 = sp.random(n, n, density=0.6, random_state=rg)
        Pu = sp.triu((P0 @ P0.T).tocsc() + sp.eye(n, format="csc"),
                     format="csc")
        q = rg.standard_normal(n)
        l = -20 + rg.standard_normal(m)
        u = 20 + rg.standard_normal(m)

        s = make(Pu, q, A, l, u)
        s.solve()  # make the sequence start from a warm state

        # the update sequence
        q2 = q + rg.standard_normal(n)
        l2 = l - np.abs(rg.standard_normal(m))
        u2 = u + np.abs(rg.standard_normal(m))
        Pu2 = Pu.copy()
        Pu2.data = Pu2.data + 0.05 * rg.standard_normal(Pu2.nnz)
        A2 = A.copy()
        A2.data = A2.data + 0.1 * rg.standard_normal(A2.nnz)

        s.update_lin_cost(q2)
        s.update_bounds(l2, u2)
        s.update_P_A(Px=Pu2.data, Ax=A2.data)

        fresh = make(Pu2, q2, A2, l2, u2)
        # identical data after the sequence
        np.testing.assert_allclose(
            np.asarray(s.data.P), np.asarray(fresh.data.P), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(s.data.A), np.asarray(fresh.data.A), atol=1e-12
        )
        # cold-start both (update resets iterates per osqp.c reset_info
        # semantics only for info; force comparability explicitly)
        r1 = s.solve()
        r2 = fresh.solve()
        if r1.info.status_val == con.OSQP_SOLVED:
            assert r2.info.status_val == con.OSQP_SOLVED
            np.testing.assert_allclose(r1.x, r2.x, atol=5e-4, rtol=1e-3)
            assert abs(r1.info.obj_val - r2.info.obj_val) <= 1e-4 * max(
                1.0, abs(r2.info.obj_val)
            )
