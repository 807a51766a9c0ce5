"""Throughput benchmark: batched small-QP solves per second per chip.

BASELINE.md north-star config: random strictly-convex QPs of the
n=100 / m=200 class, thousands of instances per chip, solved to
eps_abs = eps_rel = 1e-3 (reference defaults, constants.h:61-62).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference OSQP publishes no in-repo numbers (README.md:42-43);
vs_baseline is measured against the driver target of 10,000 QPs/s/chip
(BASELINE.json north_star), i.e. vs_baseline = value / 10000.

BENCH_CONFIGS=all additionally runs BASELINE.json configs 3 (portfolio
n=500 with warm-started parametric updates) and 4 (MPC scenario batch,
1000 instances, horizon 30, block_tridiag backend) plus a measured
HBM-roofline leg (the memory-bound analogue of MFU), prints their JSON
lines to stderr, and records everything in BENCH_DETAILS.json.
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


def _force(res):
    """Force completion via a small download (block_until_ready alone is
    unreliable on the tunneled backend)."""
    np.asarray(res.status_val)
    return res


def bench_portfolio(reps=3):
    """BASELINE config 3: portfolio family, n=500 assets (factor model,
    k=50 -> nv=550), B instances, K warm-started parametric re-solves
    with new expected returns (the reference's update/re-solve loop,
    osqp.c:765-795, at batch scale)."""
    import jax
    import jax.numpy as jnp

    from osqp_tpu.models import build_portfolio
    from osqp_tpu.parametric import BatchedSolver

    B = int(os.environ.get("BENCH_PF_BATCH", "256"))
    n, k = 500, 50
    K = int(os.environ.get("BENCH_PF_UPDATES", "8"))
    rng = np.random.default_rng(0)
    Ps, qs, As, ls, us = [], [], [], [], []
    for _ in range(B):
        mu = rng.standard_normal(n)
        F = rng.standard_normal((n, k)) / np.sqrt(k)
        D = np.abs(rng.standard_normal(n)) * np.sqrt(k)
        P, q, A, l, u = build_portfolio(mu, F, D, gamma=1.0)
        Ps.append(P), qs.append(q), As.append(A), ls.append(l), us.append(u)
    nv = qs[0].shape[0]
    bs = BatchedSolver(
        np.stack(Ps), np.stack(qs), np.stack(As), np.stack(ls), np.stack(us),
        dtype="float32", eps_abs=1e-3, eps_rel=1e-3, polish=False,
        verbose=False,
    )
    res = _force(bs.solve())  # compile + cold solve
    q_new = jnp.asarray(np.stack(qs), jnp.float32)

    # stage the K cost vectors on device up front (don't measure upload)
    q_news = [
        jax.device_put(q_new * (1.0 + 0.01 * (j + 1))) for j in range(K)
    ]
    _force(bs.resolve(q=q_news[0]))  # compile the fused resolve program

    t0 = time.perf_counter()
    total_iters = 0
    for j in range(K):
        # new expected returns -> new linear cost, warm-started re-solve
        # (ONE fused device program per re-solve, parametric._resolve_jit)
        res = _force(bs.resolve(q=q_news[j]))
        total_iters += int(np.asarray(res.iter).sum())
    dt = time.perf_counter() - t0
    solved = float(np.mean(np.asarray(res.status_val) == 1))
    qps = B * K / dt
    return {
        "metric": f"portfolio_parametric_n{nv}_B{B}",
        "value": round(qps, 1),
        "unit": "QPs/s/chip (warm-started re-solves)",
        "vs_baseline": round(qps / BASELINE_QPS_PER_SEC, 4),
        "iters_per_sec": round(total_iters / dt, 1),
        "solved": solved,
    }


def bench_roofline():
    """Measured HBM-roofline fraction of the hot ADMM loop ("what's the
    MFU?" for a memory-bound solver).  Two fixed-iteration runs
    (termination checks off) isolate the per-iteration slope exactly as
    tools/profile_iter.py; the traffic model is docs/performance.md's:
    each iteration streams Minv + (Minv A')' + A per instance, padded to
    XLA's (8, 128) f32 tiles -> 262144 B/instance/iteration at
    n=100/m=200.  The sustained-bandwidth denominator is the ~650 GB/s
    the same doc measures for pure streaming on this v5e."""
    import jax
    import jax.numpy as jnp  # noqa: F401  (device_put path)

    from osqp_tpu.batch import solve_batch

    B, n, m = 8192, 100, 200
    data = [jax.device_put(jnp.asarray(v)) for v in make_qps(B, n, m)]
    kw = dict(dtype="float32", verbose=False, polish=False,
              check_termination=0, adaptive_rho=False)
    times = {}
    for it in (16, 64):
        _force(solve_batch(*data, max_iter=it, **kw))  # compile
        best = float("inf")
        for _ in range(5):  # min-of-N: right estimator for a bandwidth bound
            t0 = time.perf_counter()
            _force(solve_batch(*data, max_iter=it, **kw))
            best = min(best, time.perf_counter() - t0)
        times[it] = best
    slope = (times[64] - times[16]) / 48.0
    # Physical (tile-padded) reads per instance per iteration:
    #   Minv 104x128 + AMinvT 104x256 + A 200x128 f32 words
    bytes_per_iter = (104 * 128 + 104 * 256 + 200 * 128) * 4 * B
    gbps = bytes_per_iter / slope / 1e9
    peak = 819.0  # v5e HBM peak bandwidth (GB/s, public spec)
    return {
        "metric": "admm_loop_hbm_roofline",
        "value": round(gbps / peak, 3),
        "unit": "fraction of 819 GB/s v5e peak HBM bandwidth",
        "ms_per_iter": round(slope * 1e3, 3),
        "gb_per_s": round(gbps, 1),
        "model": "262144 B/instance/iter (tile-padded Minv+AMinvT+A), B=8192 n=100 m=200",
        "note": "model-implied GB/s above the ~650 measured pure-stream "
                "rate means the tile-padding model overstates physical "
                "traffic (see the rejected batch-minor experiment, "
                "docs/performance.md)",
    }


def bench_mpc(reps=2):
    """BASELINE config 4: MPC scenario batch — 1000 OCP instances,
    horizon N=30, block-banded KKT via the block_tridiag backend
    (O(N b^3) factorization), vs the dense dense_inv backend."""
    import jax
    import jax.numpy as jnp

    from osqp_tpu.batch import solve_batch
    from osqp_tpu.models import build_mpc_qp

    B = int(os.environ.get("BENCH_MPC_BATCH", "1000"))
    nx, nu, N = 8, 4, 30
    rng = np.random.default_rng(0)
    Ad = np.eye(nx) + 0.05 * rng.standard_normal((nx, nx)) / np.sqrt(nx)
    Bd = rng.standard_normal((nx, nu)) / np.sqrt(nx)
    base = build_mpc_qp(
        Ad, Bd, np.eye(nx), 0.1 * np.eye(nu), horizon=N,
        xmin=np.full(nx, -10.0), xmax=np.full(nx, 10.0),
        umin=np.full(nu, -1.0), umax=np.full(nu, 1.0),
    )
    # Scenario batch: same dynamics, per-scenario initial state.
    xinits = rng.standard_normal((B, nx))
    l = np.broadcast_to(base.l, (B,) + base.l.shape).copy()
    u = np.broadcast_to(base.u, (B,) + base.u.shape).copy()
    l[:, :nx] = xinits
    u[:, :nx] = xinits
    P = np.broadcast_to(base.P, (B,) + base.P.shape)
    q = np.broadcast_to(base.q, (B,) + base.q.shape)
    A = np.broadcast_to(base.A, (B,) + base.A.shape)

    out = {}
    stage = [jax.device_put(jnp.asarray(v, jnp.float32)) for v in (P, q, A, l, u)]
    for backend, kw in (
        ("block_tridiag", dict(block_size=base.block_size)),
        ("dense_inv", {}),
    ):
        kwargs = dict(
            dtype="float32", eps_abs=1e-3, eps_rel=1e-3, polish=False,
            verbose=False, linsys_solver=backend, **kw,
        )
        res = _force(solve_batch(*stage, **kwargs))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = _force(solve_batch(*stage, **kwargs))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        iters = np.asarray(res.iter)
        out[backend] = dict(
            time=round(dt, 3),
            qps=round(B / dt, 1),
            iters_per_sec=round(float(iters.sum()) / dt, 1),
            solved=float(np.mean(np.asarray(res.status_val) == 1)),
            mean_iters=float(iters.mean()),
        )
    nv = base.P.shape[0]
    return {
        "metric": f"mpc_scenario_batch_B{B}_N{N}_nv{nv}",
        "value": out["block_tridiag"]["qps"],
        "unit": "QPs/s/chip",
        "vs_baseline": round(out["block_tridiag"]["qps"] / BASELINE_QPS_PER_SEC, 4),
        "backends": out,
    }


def main():
    import jax

    from osqp_tpu.batch import solve_batch
    from osqp_tpu.utils.cache import enable_compile_cache

    # Persistent compile cache (atomic writes) — a killed run's remote
    # TPU compile (60-120 s) otherwise has to redo from scratch, and a
    # kill mid-compile can wedge the tunneled worker for a long time.
    enable_compile_cache()

    B = int(os.environ.get("BENCH_BATCH", "8192"))
    n = int(os.environ.get("BENCH_N", "100"))
    m = int(os.environ.get("BENCH_M", "200"))
    reps = int(os.environ.get("BENCH_REPS", "5"))  # tunnel RTT noise ~8%; min-over-5 stabilizes

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
    # Distribution over reps (round-3 VERDICT weak #4: single-number
    # benches made 20.5k -> 18.7k -> 20.1k round-over-round drift
    # unattributable).  The headline stays min-over-reps (the classic
    # "best achievable" convention; tunnel RTT noise only ADDS time);
    # median/max/all make the spread visible in every artifact.
    dt = min(times)
    qps = B / dt
    qps_all = sorted(round(B / t, 1) for t in times)
    qps_median = qps_all[len(qps_all) // 2]

    print(
        f"# device={jax.devices()[0].device_kind} B={B} n={n} m={m} "
        f"solved={solved:.3f} mean_iters={iters.mean():.1f} "
        f"max_iters={iters.max()} time={dt:.3f}s "
        f"reps={reps} spread={qps_all[0]}..{qps_all[-1]}",
        file=sys.stderr,
    )
    headline = {
        "metric": f"batched_qp_throughput_n{n}_m{m}",
        "value": round(qps, 1),
        "unit": "QPs/s/chip",
        "vs_baseline": round(qps / BASELINE_QPS_PER_SEC, 4),
        "median": qps_median,
        "reps": reps,
        "qps_all": qps_all,
    }

    if os.environ.get("BENCH_CONFIGS", "") == "all":
        # Each extra config runs in its OWN subprocess: a fresh process
        # gets full HBM (the portfolio leg's device-resident state
        # otherwise crowds the MPC leg into RESOURCE_EXHAUSTED) and its
        # own jax config — the portfolio leg enables x64 for the
        # f64-residual refinement (dense_inv), the others stay on the
        # classic f32-only configuration.
        import subprocess

        details = {"random_qp_n100_m200": dict(headline, mean_iters=float(iters.mean()))}
        for name in ("portfolio", "mpc", "roofline"):
            env = dict(os.environ, BENCH_ONLY=name, BENCH_CONFIGS="")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            details[name] = r
            print("# " + json.dumps(r), file=sys.stderr)
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(details, f, indent=1)

    print(json.dumps(headline))


def run_single_config():
    """BENCH_ONLY=portfolio|mpc|roofline: run ONE extra config and print its
    JSON line (subprocess entry for the BENCH_CONFIGS=all orchestration
    above)."""
    name = os.environ["BENCH_ONLY"]
    if name == "portfolio":
        # x64 so dense_inv's f64-residual refinement is available — the
        # portfolio class is exactly the regime that needs it (see
        # docs/performance.md round 5).
        import jax

        jax.config.update("jax_enable_x64", True)
    from osqp_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    fn = {"portfolio": bench_portfolio, "mpc": bench_mpc,
          "roofline": bench_roofline}[name]
    print(json.dumps(fn()))


if __name__ == "__main__":
    if os.environ.get("BENCH_ONLY"):
        run_single_config()
    else:
        main()
