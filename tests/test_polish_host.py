"""Host-exact polish (polish_host.py) + new polish settings.

The B = 1 sparse path polishes via an exact scipy splu of the true
reduced KKT (setup-class work on the host — the device CG polish
needed 24-40k iterations on DTOC3-class masked KKTs and crashed the
TPU worker watchdog at n ~ 2e4 in f64)."""

import numpy as np
import pytest
import scipy.sparse as sp

import osqp_tpu
from osqp_tpu import constants as con
from osqp_tpu.polish_host import polish_host

from conftest import assert_allclose


def _banded(n, seed=0):
    rng = np.random.default_rng(seed)
    main = 2.0 + rng.uniform(0.5, 1.5, n)
    off = rng.uniform(-0.4, 0.4, n - 1)
    P = sp.diags([off, main, off], [-1, 0, 1], format="csc")
    A = sp.diags(
        [rng.uniform(0.5, 1.0, n - 1), np.ones(n), rng.uniform(0.5, 1.0, n - 1)],
        [-1, 0, 1], format="csc",
    )
    q = rng.normal(size=n)
    u = rng.uniform(0.5, 1.5, n)
    l = -u
    return P, q, A, l, u


def test_sparse_single_uses_host_polish_and_matches_dense():
    n = 300
    P, q, A, l, u = _banded(n)
    r_sp = osqp_tpu.solve_sparse(
        P, q, A, l, u, polish=True, verbose=False, eps_abs=1e-4, eps_rel=1e-4
    )
    assert int(np.asarray(r_sp.status_val)[0]) == con.OSQP_SOLVED
    assert int(np.asarray(r_sp.status_polish)[0]) == 1
    # dense reference solve of the same problem
    s = osqp_tpu.Solver(P, q, A, l, u, polish=True, verbose=False,
                        eps_abs=1e-4, eps_rel=1e-4)
    r_d = s.solve()
    assert r_d.info.status_polish == 1
    assert_allclose(np.asarray(r_sp.x)[0], r_d.x, tol=1e-6)
    # polished residuals are direct-solve quality
    assert float(np.asarray(r_sp.pri_res)[0]) < 1e-8
    assert float(np.asarray(r_sp.dua_res)[0]) < 1e-8


def test_polish_host_acceptance_guard():
    """The acceptance test must refuse when it cannot strictly improve
    BOTH residuals (polish.c:301-314): claiming exactly-zero ADMM
    residuals makes strict improvement impossible."""
    n = 50
    P, q, A, l, u = _banded(n, seed=1)
    x = np.zeros(n)
    y = np.zeros(n)
    ok, x2, y2, obj, pri, dua = polish_host(
        P, A, q, l, u, x, y, admm_pri_res=0.0, admm_dua_res=0.0
    )
    assert not ok
    np.testing.assert_array_equal(x2, x)


def test_polish_dtype_validation():
    P, q, A, l, u = _banded(8)
    with pytest.raises(con.OSQPError, match="polish_dtype"):
        osqp_tpu.Solver(P, q, A, l, u, polish_dtype="int32")
    # float64 target requires x64 — enabled in the test env, so accepted
    s = osqp_tpu.Solver(P, q, A, l, u, polish=True, polish_dtype="float64",
                        dtype="float32", verbose=False)
    r = s.solve()
    assert r.info.status_val == con.OSQP_SOLVED


def test_polish_passes_validation():
    P, q, A, l, u = _banded(8)
    with pytest.raises(con.OSQPError, match="polish_passes"):
        osqp_tpu.Solver(P, q, A, l, u, polish_passes=0)
