"""Anderson acceleration (opt-in, admm.py:_anderson_mix).

Safeguarded type-II AA on the ADMM fixed point. Default-off keeps
reference iteration parity; these tests pin: same solutions, measured
iteration reduction on hard families, intact infeasibility detection,
and the m = 0 / batched paths.
"""

import numpy as np
import pytest

from osqp_tpu import Solver, constants as con
from osqp_tpu.batch import solve_batch
from conftest import TESTS_TOL


def _random_qp(n, m, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n)) / np.sqrt(n)
    P = M @ M.T + 0.1 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n)) / np.sqrt(n)
    x0 = rng.standard_normal(n)
    s = np.abs(rng.standard_normal(m)) + 0.1
    return P, q, A, A @ x0 - s, A @ x0 + s


def test_aa_matches_plain_solution():
    P, q, A, l, u = _random_qp(40, 60)
    kw = dict(P=P, q=q, A=A, l=l, u=u, verbose=False, polish=False,
              eps_abs=1e-6, eps_rel=1e-6)
    r0 = Solver(**kw).solve()
    r1 = Solver(anderson_memory=5, **kw).solve()
    assert r0.info.status == r1.info.status == "solved"
    np.testing.assert_allclose(r1.x, r0.x, atol=TESTS_TOL)
    assert abs(r1.info.obj_val - r0.info.obj_val) < TESTS_TOL


def test_aa_reduces_iterations_eq_constrained():
    # Equality-constrained QPs are a slow-converging class for plain
    # ADMM; measured ~3x fewer iterations with AA (docs/performance.md).
    rng = np.random.default_rng(1)
    n, m = 60, 30
    M = rng.standard_normal((n, n)) / np.sqrt(n)
    P = M @ M.T + 0.1 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n)) / np.sqrt(n)
    b = A @ rng.standard_normal(n)
    kw = dict(P=P, q=q, A=A, l=b, u=b, verbose=False, polish=False,
              check_termination=5)
    r0 = Solver(**kw).solve()
    r1 = Solver(anderson_memory=5, **kw).solve()
    assert r0.info.status == r1.info.status == "solved"
    assert r1.info.iter < r0.info.iter


@pytest.mark.nanok
def test_aa_preserves_infeasibility_detection():
    # delta_x/delta_y stay the PLAIN step's differences, so certificates
    # keep their meaning under AA mixing.
    P, q, A, l, u = _random_qp(15, 20, seed=3)
    A2 = np.vstack([A, A[-1]])
    l2 = np.concatenate([l, [u[-1] + 1.0]])
    u2 = np.concatenate([u, [u[-1] + 2.0]])
    r = Solver(P=P, q=q, A=A2, l=l2, u=u2, verbose=False,
               anderson_memory=5).solve()
    assert r.info.status_val in (
        con.OSQP_PRIMAL_INFEASIBLE,
        con.OSQP_PRIMAL_INFEASIBLE_INACCURATE,
    )
    v = r.prim_inf_cert
    # certificate validity: A'v ~ 0 and support function negative
    assert np.max(np.abs(A2.T @ v)) < 1e-4 * max(np.linalg.norm(v, np.inf), 1)
    lo = np.where(np.isfinite(l2), l2, 0.0)
    hi = np.where(np.isfinite(u2), u2, 0.0)
    assert hi @ np.maximum(v, 0) + lo @ np.minimum(v, 0) < 0


def test_aa_unconstrained():
    rng = np.random.default_rng(4)
    n = 25
    M = rng.standard_normal((n, n)) / np.sqrt(n)
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    r = Solver(P=P, q=q, A=None, l=None, u=None, verbose=False,
               anderson_memory=4).solve()
    assert r.info.status == "solved"
    np.testing.assert_allclose(P @ r.x, -q, atol=1e-3)


def test_aa_batched_matches_plain():
    rng = np.random.default_rng(5)
    B, n, m = 8, 30, 45
    Ps, qs, As, ls, us = [], [], [], [], []
    for b in range(B):
        P, q, A, l, u = _random_qp(n, m, seed=100 + b)
        Ps.append(P), qs.append(q), As.append(A), ls.append(l), us.append(u)
    args = [np.stack(v) for v in (Ps, qs, As, ls, us)]
    kw = dict(eps_abs=1e-6, eps_rel=1e-6, polish=False, verbose=False)
    r0 = solve_batch(*args, **kw)
    r1 = solve_batch(*args, anderson_memory=5, **kw)
    assert np.all(np.asarray(r1.status_val) == 1)
    np.testing.assert_allclose(
        np.asarray(r1.x), np.asarray(r0.x), atol=10 * TESTS_TOL
    )


def test_aa_setting_validated():
    P, q, A, l, u = _random_qp(5, 5)
    with pytest.raises(con.OSQPError):
        Solver(P=P, q=q, A=A, l=l, u=u, anderson_memory=-1)
    with pytest.raises(con.OSQPError):
        Solver(P=P, q=q, A=A, l=l, u=u, anderson_memory=99)


def test_aa_mixed_z_stays_in_box():
    """The AA-mixed iterate's z block is clipped to [l, u] (scaled), so
    the termination check's pri_res = ||Ax - z|| keeps its plain-ADMM
    meaning: z box-feasible (advisor r2, medium)."""
    import jax.numpy as jnp
    from osqp_tpu import admm as admm_mod
    from osqp_tpu.solver import Settings, make_config
    from osqp_tpu.types import Iterates, QPData

    B, n, m, mem = 2, 3, 4, 3
    cfg = make_config(n, m, Settings(anderson_memory=mem), jnp.float64)
    l = jnp.full((B, m), -0.5)
    u = jnp.full((B, m), 0.5)
    data = QPData(
        P=jnp.eye(n)[None].repeat(B, 0), q=jnp.zeros((B, n)),
        A=jnp.zeros((B, m, n)), l=l, u=u,
    )
    rng = np.random.default_rng(0)
    aa = admm_mod._aa_fresh(B, n, m, mem, jnp.float64)
    # Force a large extrapolation: history of big differences pointing
    # the z block far outside the box.
    big = jnp.asarray(rng.standard_normal((B, mem, n + 2 * m)) * 50.0)
    aa = aa._replace(
        dV=big, dF=big, count=jnp.full((B,), mem, jnp.int32),
        seen=jnp.ones((B,), bool),
        prev_v=jnp.asarray(rng.standard_normal((B, n + 2 * m))),
        prev_f=jnp.asarray(rng.standard_normal((B, n + 2 * m))),
    )
    it = Iterates(
        x=jnp.zeros((B, n)),
        z=jnp.clip(jnp.asarray(rng.standard_normal((B, m))), l, u),
        y=jnp.zeros((B, m)),
    )
    c = admm_mod.init_carry(
        cfg, data,
        admm_mod.set_rho_state(data, jnp.full((B,), 0.1)),
        factor=None, iterates=it,
    )._replace(aa=aa)
    it_plain = Iterates(
        x=jnp.asarray(rng.standard_normal((B, n))),
        z=jnp.clip(jnp.asarray(rng.standard_normal((B, m)) * 2.0), l, u),
        y=jnp.asarray(rng.standard_normal((B, m))),
    )
    _, mixed = admm_mod._anderson_mix(cfg, data, c, it_plain)
    assert bool(jnp.all(mixed.z >= l - 1e-12))
    assert bool(jnp.all(mixed.z <= u + 1e-12))
