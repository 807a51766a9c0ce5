"""Iteration/objective parity study: reference algorithm vs osqp_tpu.

Runs the host-side f64 re-implementation of the reference OSQP loop
(tools/ref_osqp.py — exact osqp.c:354-532 scheduling) over the
regenerated Maros-Meszaros corpus at reference defaults and records
per-problem iterations, status, objective, residuals and polish outcome.
The output (PARITY_REF.json) is merged into PARITY.md's per-problem
table next to MAROS_r*.json so every >2x iteration discrepancy between
osqp_tpu and the reference algorithm is visible and attributable
(VERDICT round-3, Missing #2).

Usage:
    python tools/parity_study.py [--interval fixed|time] [--max-iter N]
        [--out PARITY_REF.json] [--only NAME ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from ref_osqp import ref_solve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", default="fixed")
    ap.add_argument("--max-iter", type=int, default=20000)
    ap.add_argument("--out", default="PARITY_REF.json")
    ap.add_argument("--dir", default="tests/data/maros_mm")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from osqp_tpu.io.qps import load_qps

    paths = sorted(glob.glob(os.path.join(args.dir, "*.qps")))
    if args.only:
        keep = {n.upper() for n in args.only}
        paths = [p for p in paths if os.path.basename(p)[:-4].upper() in keep]

    idx_path = os.path.join(args.dir, "MM_INDEX.json")
    published = {}
    if os.path.exists(idx_path):
        idx = json.load(open(idx_path))
        published = {
            k: v.get("published") for k, v in idx.get("problems", {}).items()
        }

    interval = args.interval if args.interval in ("fixed", "time") else int(args.interval)
    rows = []
    for p in paths:
        name = os.path.basename(p)[:-4]
        qp = load_qps(p)
        t0 = time.perf_counter()
        try:
            r = ref_solve(
                qp.P, qp.q, qp.A, qp.l, qp.u,
                max_iter=args.max_iter, interval=interval,
            )
        except Exception as e:  # singular KKT etc. — record, keep going
            rows.append(dict(name=name, n=qp.n, m=qp.m, error=str(e)))
            print(f"{name}: ERROR {e}", flush=True)
            continue
        obj = r["obj"] + qp.obj_constant
        pub = published.get(name)
        rel = (
            abs(obj - pub) / max(1.0, abs(pub)) if pub is not None else None
        )
        row = dict(
            name=name,
            n=qp.n,
            m=qp.m,
            status=r["status"],
            iter=r["iter"],
            obj=obj,
            published=pub,
            rel_obj_err=rel,
            pri_res=float(r["pri_res"]),
            dua_res=float(r["dua_res"]),
            rho_updates=r["rho_updates"],
            status_polish=r["status_polish"],
            time=time.perf_counter() - t0,
        )
        rows.append(row)
        print(
            f"{name:12s} n={qp.n:6d} m={qp.m:6d} {r['status']:10s} "
            f"iter={r['iter']:6d} polish={r['status_polish']:2d} "
            f"obj={obj:.6g} rel={rel if rel is None else f'{rel:.1e}'} "
            f"t={row['time']:.1f}s",
            flush=True,
        )

    solved = sum(1 for r in rows if r.get("status") == "solved")
    pol = sum(1 for r in rows if r.get("status_polish") == 1)
    out = dict(
        interval=args.interval,
        max_iter=args.max_iter,
        problems=len(rows),
        solved=solved,
        polish_success=pol,
        rows=rows,
    )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}: {solved}/{len(rows)} solved, {pol} polished")


if __name__ == "__main__":
    main()
