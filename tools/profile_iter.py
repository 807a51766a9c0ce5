"""Per-iteration cost profiling on the real TPU.

Measures the pure ADMM-loop slope (fixed iteration counts, termination
checks off) of the dense_inv backend — the speed-of-light check against
the HBM roofline model in docs/performance.md.
Run: python tools/profile_iter.py [B n m]...
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_qps(B, n, m, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n, dtype=np.float32)
    q = rng.standard_normal((B, n)).astype(np.float32)
    A = rng.standard_normal((B, m, n)).astype(np.float32) / np.sqrt(n)
    xr = rng.standard_normal((B, n)).astype(np.float32)
    Ax = np.einsum("bmn,bn->bm", A, xr)
    spread = np.abs(rng.standard_normal((B, m))).astype(np.float32)
    return P, q, A, Ax - spread - 0.1, Ax + spread + 0.1


def run(B=8192, n=100, m=200, iters_list=(16, 64)):
    import jax
    import jax.numpy as jnp

    from osqp_tpu.batch import solve_batch

    data = [jax.device_put(jnp.asarray(v)) for v in make_qps(B, n, m)]
    times = {}
    for it in iters_list:
        kw = dict(
            dtype="float32", verbose=False, polish=False,
            check_termination=0, adaptive_rho=False, max_iter=it,
        )
        # NB: on the tunneled backend block_until_ready does not reliably
        # block; a tiny download (the (B,) status vector) forces sync.
        r = solve_batch(*data, **kw)
        np.asarray(r.status_val)
        t0 = time.perf_counter()
        r = solve_batch(*data, **kw)
        np.asarray(r.status_val)
        times[it] = time.perf_counter() - t0
    its = sorted(times)
    slope = (times[its[-1]] - times[its[0]]) / (its[-1] - its[0])
    print(
        f"B={B} n={n} m={m} t{its[0]}={times[its[0]]:.3f}s t{its[-1]}="
        f"{times[its[-1]]:.3f}s per_iter={slope*1e3:.3f}ms "
        f"fixed={times[its[0]] - slope*its[0]:.3f}s",
        flush=True,
    )
    return slope


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run(*(int(a) for a in sys.argv[1:4]))
    else:
        run()
