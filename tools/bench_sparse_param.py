"""Parametric sparse re-solve benchmark (VERDICT r2 item 4 artifact).

Measures the reference's parametric workload (osqp.c:765-1279: update
values in place, re-solve warm-started) at n = 10k on the sparse path:

* ``stateless``: the round-2 pattern — a fresh :func:`solve_sparse`
  per update (host ELL pattern rebuild + re-upload every round);
* ``resident``: the round-3 :class:`SparseSolver` — pattern built once,
  updates scatter values through the device gather maps, iterates warm
  start on device.

Usage:  python tools/bench_sparse_param.py [--n 10000] [--k 10] [--out f]
Prints one JSON line per mode + a summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")


def make_problem(n: int, seed: int = 0):
    """Banded LISWET-class QP with an n-1 row difference operator."""
    rng = np.random.default_rng(seed)
    main = 2.0 + np.abs(rng.standard_normal(n))
    off = 0.5 * rng.standard_normal(n - 1)
    P = sp.diags([off, main, off], [-1, 0, 1], format="csc")
    A = sp.vstack(
        [sp.eye(n), sp.diags([np.ones(n - 1), -2 * np.ones(n - 1)], [0, 1],
                             shape=(n - 1, n))],
        format="csc",
    )
    q = rng.standard_normal(n)
    m = A.shape[0]
    l = np.full(m, -2.0)
    u = np.full(m, 2.0)
    return P, q, A, l, u


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--k", type=int, default=10, help="update/re-solve rounds")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import osqp_tpu
    from osqp_tpu.large import solve_sparse

    P, q, A, l, u = make_problem(args.n)
    Pu = sp.triu(P, format="csc")  # the canonical triu pattern updates address
    qs = [q * (1.0 + 0.05 * k) for k in range(args.k + 1)]
    scales = [1.0 + 0.02 * k for k in range(args.k + 1)]

    rows = {}

    # resident: setup once, K x (update + warm re-solve)
    s = osqp_tpu.SparseSolver(P=P, q=q, A=A, l=l, u=u, verbose=False)
    r = s.solve()
    assert r.info.status == "solved", r.info.status
    t0 = time.perf_counter()
    iters = 0
    for k in range(1, args.k + 1):
        s.update_lin_cost(qs[k])
        s.update_P(Px=Pu.data * scales[k])
        rk = s.solve()
        iters += rk.info.iter
    t_res = time.perf_counter() - t0
    rows["resident"] = dict(
        mode="resident", n=args.n, k=args.k,
        total_s=round(t_res, 4), per_resolve_s=round(t_res / args.k, 4),
        mean_iters=round(iters / args.k, 1), status=rk.info.status,
    )

    # stateless: fresh solve_sparse each round (warm start via host arrays,
    # the round-2 SparseSolver behaviour)
    x0 = y0 = None
    res = solve_sparse(P, qs[0], A, l, u, verbose=False)  # compile/warm
    t0 = time.perf_counter()
    iters = 0
    for k in range(1, args.k + 1):
        Pk = Pu.copy()
        Pk.data = Pu.data * scales[k]
        res = solve_sparse(Pk, qs[k], A, l, u, x0=x0, y0=y0, verbose=False)
        x0 = np.asarray(res.x)[0]
        y0 = np.asarray(res.y)[0]
        iters += int(np.asarray(res.iter)[0])
    t_sl = time.perf_counter() - t0
    rows["stateless"] = dict(
        mode="stateless", n=args.n, k=args.k,
        total_s=round(t_sl, 4), per_resolve_s=round(t_sl / args.k, 4),
        mean_iters=round(iters / args.k, 1),
        status=int(np.asarray(res.status_val)[0]),
    )

    summary = dict(
        metric="sparse_parametric_resolve_speedup",
        n=args.n, k=args.k,
        resident_per_resolve_s=rows["resident"]["per_resolve_s"],
        stateless_per_resolve_s=rows["stateless"]["per_resolve_s"],
        speedup=round(t_sl / t_res, 2),
    )
    for r_ in rows.values():
        print(json.dumps(r_))
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
