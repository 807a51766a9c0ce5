"""AOT export (EMBEDDED-mode analogue): serialize, reload, same results."""

import numpy as np

from osqp_tpu.batch import solve_batch
from osqp_tpu.export import export_solver, load_solver

from conftest import assert_allclose


def _problems(B, n, m, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((B, n, n))
    P = np.einsum("bij,bkj->bik", M, M) / n + 0.2 * np.eye(n)
    q = rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n))
    x0 = rng.standard_normal((B, n))
    Ax = np.einsum("bmn,bn->bm", A, x0)
    l = Ax - 0.5 - np.abs(rng.standard_normal((B, m)))
    u = Ax + 0.5 + np.abs(rng.standard_normal((B, m)))
    return P, q, A, l, u


def test_solver_export_method(tmp_path):
    """Solver.export writes a loadable artifact matching the live solve."""
    import osqp_tpu
    from osqp_tpu.export import load_solver

    P, q, A, l, u = (v[:1] for v in _problems(1, 5, 8, seed=4))
    s = osqp_tpu.Solver(
        P=P[0], q=q[0], A=A[0], l=l[0], u=u[0],
        verbose=False, polish=True, dtype="float64",
    )
    live = s.solve()
    path = tmp_path / "solver.bin"
    blob = s.export(str(path))
    assert path.read_bytes() == blob
    fn = load_solver(blob)
    out = fn(*(np.asarray(v, np.float64) for v in (P, q, A, l, u)))
    assert int(np.asarray(out["status_val"])[0]) == 1
    assert_allclose(out["x"][0], live.x, tol=1e-9)


def test_export_roundtrip_matches_live_solve():
    B, n, m = 4, 6, 9
    P, q, A, l, u = _problems(B, n, m)
    blob = export_solver(
        B, n, m, dtype="float64", polish=True, verbose=False
    )
    assert isinstance(blob, bytes) and len(blob) > 1000

    fn = load_solver(blob)
    out = fn(*(np.asarray(v, np.float64) for v in (P, q, A, l, u)))
    live = solve_batch(P, q, A, l, u, dtype="float64", polish=True, verbose=False)

    assert np.all(np.asarray(out["status_val"]) == 1)
    assert_allclose(out["x"], live.x, tol=1e-10)
    assert_allclose(out["obj_val"], live.obj_val, tol=1e-10)
    np.testing.assert_array_equal(
        np.asarray(out["iter"]), np.asarray(live.iter)
    )


def test_sparse_pattern_export_roundtrip(tmp_path):
    """SparseSolver.export bakes the ELL pattern + value maps into the
    artifact; the callable takes only CSC-order value vectors — the
    EMBEDDED parametric workflow at sparse scale.  Round-trips through
    load_sparse_solver and matches the live solver, including after a
    P-value update pushed through the same artifact."""
    import scipy.sparse as sp

    import osqp_tpu
    from osqp_tpu.export import load_sparse_solver

    n = 80
    rng = np.random.default_rng(5)
    P = sp.diags(np.abs(rng.standard_normal(n)) + 1.0).tocsc()
    A = sp.vstack(
        [sp.eye(n), sp.diags([1.0] * (n - 1), 1).tocsr()[: n - 1]]
    ).tocsc()
    q = rng.standard_normal(n)
    m = A.shape[0]
    l, u = -np.ones(m), np.ones(m)

    s = osqp_tpu.SparseSolver(P=P, q=q, A=A, l=l, u=u, verbose=False,
                              dtype="float64")
    path = tmp_path / "sparse.bin"
    blob = s.export(path=str(path))
    assert path.read_bytes() == blob
    fn = load_sparse_solver(blob)

    Pu = sp.triu(P, format="csc")
    out = fn(Pu.data, q[None], A.data, l[None], u[None])
    r = s.solve()
    assert int(out["status_val"][0]) == 1
    np.testing.assert_allclose(np.asarray(out["x"])[0], np.asarray(r.x),
                               atol=1e-6)

    out2 = fn(Pu.data * 2.0, q[None], A.data, l[None], u[None])
    s.update_P(Px=Pu.data * 2.0)
    r2 = s.solve()
    np.testing.assert_allclose(np.asarray(out2["x"])[0], np.asarray(r2.x),
                               atol=1e-5)
