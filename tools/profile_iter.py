"""Per-iteration cost profiling on the real TPU.

Measures the pure ADMM-loop slope (fixed iteration counts, termination
checks off) for GEMV strategy variants of the dense_inv backend, to
find the speed-of-light formulation.  Run: python tools/profile_iter.py
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


def run(mode, iters_list=(16, 64)):
    os.environ["OSQP_TPU_GEMV_MODE"] = mode
    # Fresh import per mode
    for k in list(sys.modules):
        if k.startswith("osqp_tpu"):
            del sys.modules[k]
    import jax
    import jax.numpy as jnp

    from osqp_tpu.batch import solve_batch

    B, n, m = 8192, 100, 200
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
        f"mode={mode:10s} t{its[0]}={times[its[0]]:.3f}s t{its[-1]}="
        f"{times[its[-1]]:.3f}s per_iter={slope*1e3:.3f}ms "
        f"fixed={times[its[0]] - slope*its[0]:.3f}s",
        flush=True,
    )
    return slope


if __name__ == "__main__":
    for mode in sys.argv[1:] or ["mxu", "vpu"]:
        run(mode)
