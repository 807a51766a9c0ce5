"""Instance compaction: per-instance results identical to the plain
batched path (compaction only changes which instances share a program,
never the math)."""

import numpy as np
import pytest

from osqp_tpu import constants as con
from osqp_tpu.batch import solve_batch

from test_batch import random_qps


def _compare(res_a, res_b):
    for field in (
        "x", "y", "status_val", "iter", "obj_val", "pri_res", "dua_res",
        "rho_updates", "status_polish",
    ):
        a = np.asarray(getattr(res_a, field))
        b = np.asarray(getattr(res_b, field))
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-10, err_msg=field)


def test_compact_equals_plain():
    B, n, m = 32, 8, 12
    P, q, A, l, u = random_qps(B, n, m, seed=11)
    kw = dict(verbose=False, polish=True)
    plain = solve_batch(P, q, A, l, u, **kw)
    comp = solve_batch(
        P, q, A, l, u, compact=True, min_compact_batch=4, **kw
    )
    assert np.all(np.asarray(plain.status_val) == con.OSQP_SOLVED)
    _compare(comp, plain)
    # Iteration counts disperse (so compaction actually kicked in)
    iters = np.asarray(plain.iter)
    assert iters.max() > iters.min()


@pytest.mark.nanok
def test_compact_with_infeasible_instances():
    B, n, m = 16, 6, 8
    P, q, A, l, u = random_qps(B, n, m, seed=13)
    # Make a few instances primal infeasible: contradictory duplicate rows
    for i in (3, 9):
        A[i, 1] = A[i, 0]
        l[i, 0], u[i, 0] = 1.0, 2.0
        l[i, 1], u[i, 1] = 3.0, 4.0
    kw = dict(verbose=False)
    plain = solve_batch(P, q, A, l, u, **kw)
    comp = solve_batch(P, q, A, l, u, compact=True, min_compact_batch=4, **kw)
    _compare(comp, plain)
    sv = np.asarray(comp.status_val)
    assert sv[3] == con.OSQP_PRIMAL_INFEASIBLE
    assert sv[9] == con.OSQP_PRIMAL_INFEASIBLE
    np.testing.assert_allclose(
        np.asarray(comp.prim_inf_cert)[3],
        np.asarray(plain.prim_inf_cert)[3],
        atol=1e-12,
    )


def test_compact_max_iter_instances():
    B, n, m = 8, 6, 8
    P, q, A, l, u = random_qps(B, n, m, seed=17)
    plain = solve_batch(P, q, A, l, u, verbose=False, max_iter=30)
    comp = solve_batch(
        P, q, A, l, u, compact=True, min_compact_batch=2,
        verbose=False, max_iter=30,
    )
    _compare(comp, plain)


def test_compact_rejects_ell_operands():
    """compact=True with ELL (sparse) operands must fail fast: the
    gather-based compaction would silently corrupt the unbatched
    sparsity-pattern leaves (advisor r2)."""
    import pytest
    import scipy.sparse as sp
    from osqp_tpu import constants as con
    from osqp_tpu.batch import _solve_segmented
    from osqp_tpu.large import prepare_sparse

    P = sp.eye(4, format="csr") * 2.0
    A = sp.eye(4, format="csr")
    q = np.ones(4)
    l, u = -np.ones(4), np.ones(4)
    s, dtype, cfg, dyn, P_ell, A_ell, q2, l2, u2 = prepare_sparse(
        P, q, A, l, u, {}
    )
    import jax.numpy as jnp

    rho0 = jnp.full((1,), s.rho, dtype)
    with pytest.raises(con.OSQPError, match="compaction"):
        _solve_segmented(
            cfg, 0, False, 0, P_ell, jnp.asarray(q2, dtype), A_ell,
            jnp.asarray(l2, dtype), jnp.asarray(u2, dtype), rho0, dyn,
            None, None, compact=True,
        )
