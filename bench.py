"""Throughput benchmark: batched small-QP solves per second per chip.

BASELINE.md north-star config: random strictly-convex QPs of the
n=100 / m=200 class, thousands of instances per chip, solved to
eps_abs = eps_rel = 1e-3 (reference defaults, constants.h:61-62).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference OSQP publishes no in-repo numbers (README.md:42-43);
vs_baseline is measured against the driver target of 10,000 QPs/s/chip
(BASELINE.json north_star), i.e. vs_baseline = value / 10000.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_QPS_PER_SEC = 10_000.0


def make_qps(B, n, m, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((B, n, n)).astype(dtype)
    P = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n, dtype=dtype)
    q = rng.standard_normal((B, n)).astype(dtype)
    A = rng.standard_normal((B, m, n)).astype(dtype) / np.sqrt(n)
    xr = rng.standard_normal((B, n)).astype(dtype)
    Ax = np.einsum("bmn,bn->bm", A, xr)
    spread = np.abs(rng.standard_normal((B, m))).astype(dtype)
    l = Ax - spread - 0.1
    u = Ax + spread + 0.1
    return P, q, A, l, u


def main():
    import jax

    from osqp_tpu.batch import solve_batch

    B = int(os.environ.get("BENCH_BATCH", "8192"))
    n = int(os.environ.get("BENCH_N", "100"))
    m = int(os.environ.get("BENCH_M", "200"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    import jax.numpy as jnp

    # Stage problem data on device once — the metric is solver throughput
    # per chip, not host-link upload bandwidth.
    P, q, A, l, u = (
        jax.device_put(jnp.asarray(v, jnp.float32)) for v in make_qps(B, n, m)
    )

    kwargs = dict(
        dtype="float32",
        verbose=False,
        polish=False,
        eps_abs=1e-3,
        eps_rel=1e-3,
    )
    if os.environ.get("BENCH_COMPACT", "0") == "1":
        kwargs["compact"] = True
        kwargs["min_compact_batch"] = int(
            os.environ.get("BENCH_COMPACT_MIN", "512")
        )

    # Compile + warm up.  NB: timing must force completion with a small
    # *download* — on the tunneled backend block_until_ready alone does
    # not reliably block (see .claude/skills/verify).
    res = solve_batch(P, q, A, l, u, **kwargs)
    status = np.asarray(res.status_val)
    solved = np.mean(status == 1)
    iters = np.asarray(res.iter)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = solve_batch(P, q, A, l, u, **kwargs)
        np.asarray(res.status_val)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    qps = B / dt

    print(
        f"# device={jax.devices()[0].device_kind} B={B} n={n} m={m} "
        f"solved={solved:.3f} mean_iters={iters.mean():.1f} "
        f"max_iters={iters.max()} time={dt:.3f}s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"batched_qp_throughput_n{n}_m{m}",
                "value": round(qps, 1),
                "unit": "QPs/s/chip",
                "vs_baseline": round(qps / BASELINE_QPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
