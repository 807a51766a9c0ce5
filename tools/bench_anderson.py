"""Anderson-acceleration benchmark (prove-or-drop, VERDICT r2 item 7).

Measures iterations AND wall-clock with ``anderson_memory`` off vs on
for the slow-converging families where type-II AA on the ADMM fixed
point should help (equality-constrained QPs, huber at tight eps), plus
a family where it should be neutral (random box QPs).  Writes
AA_BENCH_r03.json; the docs quote these numbers.

Usage: python tools/bench_anderson.py [--device] [--out f]
  --device  run on the default (TPU) backend in f32; default CPU/x64.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def families(B=64):
    rng = np.random.default_rng(0)
    out = {}

    # equality-constrained (slowest plain-ADMM class)
    n, m = 60, 30
    M = rng.standard_normal((B, n, n)) / np.sqrt(n)
    P = np.einsum("bij,bkj->bik", M, M) + 0.1 * np.eye(n)
    q = rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n)) / np.sqrt(n)
    b = np.einsum("bmn,bn->bm", A, rng.standard_normal((B, n)))
    out["eq_qp_n60"] = (P, q, A, b, b, dict())

    # huber fitting at tight eps (dual variables converge slowly)
    from osqp_tpu.models import build_huber

    Ps, qs, As, ls, us = [], [], [], [], []
    nh, mh = 40, 80
    for i in range(B):
        Ad = rng.standard_normal((mh, nh))
        bd = Ad @ rng.standard_normal(nh) + 10.0 * (
            rng.random(mh) < 0.1
        ) * rng.standard_normal(mh)
        Ph, qh, Ah, lh, uh = build_huber(Ad, bd, 1.0)
        Ps.append(Ph), qs.append(qh), As.append(Ah)
        ls.append(lh), us.append(uh)
    out["huber_tight"] = (
        np.stack(Ps), np.stack(qs), np.stack(As), np.stack(ls),
        np.stack(us), dict(eps_abs=1e-6, eps_rel=1e-6),
    )

    # random box QPs (plain ADMM already fast; AA should not hurt)
    n, m = 50, 100
    M = rng.standard_normal((B, n, n)) / np.sqrt(n)
    P2 = np.einsum("bij,bkj->bik", M, M) + 0.1 * np.eye(n)
    q2 = rng.standard_normal((B, n))
    A2 = rng.standard_normal((B, m, n)) / np.sqrt(n)
    Ax = np.einsum("bmn,bn->bm", A2, rng.standard_normal((B, n)))
    s = np.abs(rng.standard_normal((B, m))) + 0.1
    out["random_box"] = (P2, q2, A2, Ax - s, Ax + s, dict())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true")
    ap.add_argument("--out", type=str, default="AA_BENCH_r03.json")
    ap.add_argument("--mem", type=int, default=5)
    args = ap.parse_args()

    import jax

    if not args.device:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        from osqp_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()

    from osqp_tpu.batch import solve_batch

    results = {}
    for fam, (P, q, A, l, u, extra) in families().items():
        row = {}
        for mem in (0, args.mem):
            kw = dict(verbose=False, polish=False, **extra)
            if args.device:
                kw["dtype"] = "float32"
            res = solve_batch(P, q, A, l, u, anderson_memory=mem, **kw)
            np.asarray(res.status_val)  # warm-up + compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                res = solve_batch(P, q, A, l, u, anderson_memory=mem, **kw)
                np.asarray(res.status_val)
                ts.append(time.perf_counter() - t0)
            iters = np.asarray(res.iter)
            solved = float(np.mean(np.asarray(res.status_val) == 1))
            row[f"mem{mem}"] = dict(
                mean_iters=float(iters.mean()),
                max_iters=int(iters.max()),
                solved=solved,
                time_s=round(min(ts), 3),
            )
        row["iter_speedup"] = round(
            row["mem0"]["mean_iters"] / max(row[f"mem{args.mem}"]["mean_iters"], 1e-9), 2
        )
        row["wall_speedup"] = round(
            row["mem0"]["time_s"] / max(row[f"mem{args.mem}"]["time_s"], 1e-9), 2
        )
        results[fam] = row
        print(fam, json.dumps(row))

    with open(args.out, "w") as f:
        json.dump(dict(anderson_memory=args.mem,
                       device="default" if args.device else "cpu/x64",
                       families=results), f, indent=1)


if __name__ == "__main__":
    main()
