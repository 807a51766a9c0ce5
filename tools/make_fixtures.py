"""Generate the QPS fixture corpus in tests/data/generated/.

Two sources:

* hand-encoded classic test problems (QPTEST from the Maros-Meszaros
  set; TAME, GENHS28, HS52 from the Hock-Schittkowski collection),
  written from their mathematical definitions;
* OSQP-paper family instances (osqp_tpu.benchmarks generators)
  serialized through the QPS writer — these exercise the parser, the
  RANGES/BOUNDS paths, and the heterogeneous bucketing harness at many
  shapes.

Every fixture gets a reference objective from a tight float64 solve
(eps = 1e-9, kkt_lu backend) verified by the independent f64 KKT
checker; results land in INDEX.json next to the files.

Run:  python tools/make_fixtures.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from osqp_tpu import constants as con
from osqp_tpu.benchmarks import FAMILIES, stable_seed
from osqp_tpu.io.qps import load_qps
from osqp_tpu.io.qps_write import write_qps
from osqp_tpu.solver import Solver
from osqp_tpu.verify import kkt_check

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "generated")


# ---------------------------------------------------------------------------
# Hand-encoded classics (from the problem definitions)
# ---------------------------------------------------------------------------
def classics():
    inf = np.inf
    out = {}

    # QPTEST (Maros-Meszaros): min 1.5 x1 - 2 x2 + 0.5 x'[[8,2],[2,10]]x
    # s.t. 2 x1 + x2 >= 2, -x1 + 2 x2 <= 6, 0 <= x1 <= 20, x2 >= 0.
    # Optimum 4.371875 at x = (0.7625, 0.475).
    out["QPTEST"] = (
        np.array([[8.0, 2.0], [2.0, 10.0]]),
        np.array([1.5, -2.0]),
        np.array([[2.0, 1.0], [-1.0, 2.0], [1.0, 0.0], [0.0, 1.0]]),
        np.array([2.0, -inf, 0.0, 0.0]),
        np.array([inf, 6.0, 20.0, inf]),
    )

    # TAME (HS collection): min (x1 - x2)^2 s.t. x1 + x2 = 1, x >= 0.
    out["TAME"] = (
        np.array([[2.0, -2.0], [-2.0, 2.0]]),
        np.zeros(2),
        np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]),
        np.array([1.0, 0.0, 0.0]),
        np.array([1.0, inf, inf]),
    )

    # HS52: min (4x1-x2)^2 + (x2+x3-2)^2 + (x4-1)^2 + (x5-1)^2
    # s.t. x1 + 3x2 = 0, x3 + x4 - 2x5 = 0, x2 - x5 = 0.
    J = np.array(
        [
            [4.0, -1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 1.0],
        ]
    )
    b = np.array([0.0, 2.0, 1.0, 1.0])
    A52 = np.array(
        [
            [1.0, 3.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 1.0, -2.0],
            [0.0, 1.0, 0.0, 0.0, -1.0],
        ]
    )
    out["HS52"] = (
        2.0 * J.T @ J,
        -2.0 * J.T @ b,
        A52,
        np.zeros(3),
        np.zeros(3),
    )  # obj_constant b'b = 6 handled below

    # GENHS28: min sum_{i=1..9} (x_i + x_{i+1})^2,
    # s.t. x_i + 2 x_{i+1} + 3 x_{i+2} = 1 for i = 1..8 (n = 10).
    n = 10
    Jg = np.zeros((9, n))
    for i in range(9):
        Jg[i, i] = 1.0
        Jg[i, i + 1] = 1.0
    Ag = np.zeros((8, n))
    for i in range(8):
        Ag[i, i] = 1.0
        Ag[i, i + 1] = 2.0
        Ag[i, i + 2] = 3.0
    out["GENHS28"] = (
        2.0 * Jg.T @ Jg,
        np.zeros(n),
        Ag,
        np.ones(8),
        np.ones(8),
    )
    return out


OBJ_CONSTANTS = {"HS52": 6.0}


def main():
    os.makedirs(OUT, exist_ok=True)
    index = {}

    problems = []
    for name, (P, q, A, l, u) in classics().items():
        problems.append((name, P, q, A, l, u, OBJ_CONSTANTS.get(name, 0.0)))

    # Family instances: 3 sizes per family, 1 instance each.
    feasible = [f for f in FAMILIES if not f.endswith("infeasible")]
    for fam in feasible:
        for n in (8, 20, 50):
            rng = np.random.default_rng(stable_seed(fam, n, "fixture"))
            P, q, A, l, u = FAMILIES[fam](n, rng)
            problems.append((f"{fam.upper()}_{n}", P, q, A, l, u, 0.0))
    # One infeasible fixture of each kind (status fixtures, no objective).
    for fam in ("primal_infeasible", "dual_infeasible"):
        rng = np.random.default_rng(stable_seed(fam, "fixture"))
        P, q, A, l, u = FAMILIES[fam](10, rng)
        problems.append((fam.upper(), P, q, A, l, u, 0.0))

    for name, P, q, A, l, u, cst in problems:
        path = os.path.join(OUT, f"{name}.qps")
        write_qps(name, P, q, A, l, u, obj_constant=cst, path=path)

        # Round-trip check: parse back and compare dense forms.
        qp = load_qps(path)
        from osqp_tpu.sparse import triu_to_full

        Pd = np.triu(np.asarray(P, np.float64))
        Pd = Pd + Pd.T - np.diag(np.diag(Pd))
        assert np.allclose(triu_to_full(qp.P), Pd, atol=1e-12), name
        assert np.allclose(qp.q, q, atol=1e-12), name
        assert abs(qp.obj_constant - cst) < 1e-12, name

        if name in ("PRIMAL_INFEASIBLE", "DUAL_INFEASIBLE"):
            expect = (
                con.OSQP_PRIMAL_INFEASIBLE
                if name == "PRIMAL_INFEASIBLE"
                else con.OSQP_DUAL_INFEASIBLE
            )
            index[name] = dict(status_val=expect)
            print(f"{name:<24} (infeasibility fixture)")
            continue

        # Tight f64 reference solve + independent verification.
        s = Solver(
            qp.P, qp.q, qp.A, qp.l, qp.u,
            dtype="float64", linsys_solver="kkt_lu",
            eps_abs=1e-9, eps_rel=1e-9, polish=True, max_iter=20000,
            verbose=False,
        )
        r = s.solve()
        assert r.info.status_val == con.OSQP_SOLVED, (name, r.info.status)
        chk = kkt_check(qp.P, qp.q, qp.A, qp.l, qp.u, r.x, r.y,
                        eps_abs=1e-7, eps_rel=1e-7)
        assert chk["ok"], (name, chk)
        index[name] = dict(
            status_val=int(con.OSQP_SOLVED),
            obj=float(r.info.obj_val + qp.obj_constant),
        )
        print(f"{name:<24} obj={index[name]['obj']:+.9e}")

    with open(os.path.join(OUT, "INDEX.json"), "w") as f:
        json.dump(index, f, indent=1, sort_keys=True)
    print(f"{len(problems)} fixtures -> {OUT}")




# ---------------------------------------------------------------------------
# Large sparse fixture (sparse end-to-end; --large N)
# ---------------------------------------------------------------------------
def make_banded(n):
    """Strictly-convex banded QP (LISWET-CLASS SIZE, controlled
    conditioning): tridiagonal diagonally-dominant P, bidiagonal A,
    box constraints active on ~half the rows.  (The actual LISWET
    family was tried and rejected as a fixture: its dual Hessian DD'
    with D the second-difference operator has condition ~n^4, and no
    solver available here pins its flat optimum to reference accuracy.)
    """
    import scipy.sparse as sp

    rng = np.random.default_rng(11)
    main = 2.0 + np.abs(rng.standard_normal(n))
    off = 0.5 * rng.standard_normal(n - 1)
    P = sp.diags([off, main, off], [-1, 0, 1], format="csc")
    A = sp.diags([np.ones(n), 0.5 * np.ones(n - 1)], [0, -1],
                 shape=(n, n), format="csc")
    q = rng.standard_normal(n)
    x0 = rng.standard_normal(n)
    Ax = A @ x0
    spread = np.abs(rng.standard_normal(n)) + 0.1
    return P, q, A, Ax - spread, Ax + spread


def main_large(n):
    """Write BANDED_{n}.qps + INDEX entry (never densifies)."""
    from osqp_tpu.large import SparseSolver

    os.makedirs(OUT, exist_ok=True)
    P, q, A, l, u = make_banded(n)
    name = f"BANDED_{n}"
    path = os.path.join(OUT, f"{name}.qps")
    write_qps(name, P, q, A, l, u, path=path)

    qp = load_qps(path)
    assert qp.n == n and qp.m == n, (qp.n, qp.m)
    s = SparseSolver(
        P=qp.P, q=qp.q, A=qp.A, l=qp.l, u=qp.u,
        dtype="float64", eps_abs=1e-7, eps_rel=1e-7, max_iter=20000,
        verbose=False,
    )
    r = s.solve()
    assert r.info.status_val == con.OSQP_SOLVED, r.info.status
    chk = kkt_check(qp.P, qp.q, qp.A, qp.l, qp.u,
                    np.asarray(r.x if not hasattr(r, "x") else r.x),
                    np.asarray(r.y), eps_abs=1e-6, eps_rel=1e-6)
    assert chk["ok"], chk
    idx_path = os.path.join(OUT, "INDEX.json")
    index = json.load(open(idx_path)) if os.path.exists(idx_path) else {}
    index[name] = dict(
        status_val=int(con.OSQP_SOLVED),
        obj=float(r.info.obj_val + qp.obj_constant),
    )
    with open(idx_path, "w") as f:
        json.dump(index, f, indent=1, sort_keys=True)
    print(f"{name}: n={n} nnz(P)={qp.P.nnz} obj={index[name]['obj']:+.9e} "
          f"iters={r.info.iter}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--large":
        main_large(int(sys.argv[2]))
    else:
        main()
