"""Isolate portfolio stragglers: our batched solver at f64 vs f32 on CPU."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from osqp_tpu.batch import solve_batch
from osqp_tpu.models import build_portfolio

n, k, B = 500, 50, 32
rng = np.random.default_rng(0)
Ps, qs, As, ls, us = [], [], [], [], []
for _ in range(B):
    mu = rng.standard_normal(n)
    F = rng.standard_normal((n, k)) / np.sqrt(k)
    D = np.abs(rng.standard_normal(n)) * np.sqrt(k)
    P, q, A, l, u = build_portfolio(mu, F, D, gamma=1.0)
    Ps.append(P), qs.append(q), As.append(A), ls.append(l), us.append(u)
data = [np.stack(v) for v in (Ps, qs, As, ls, us)]
for dtype in ("float64", "float32"):
    res = solve_batch(*data, dtype=dtype, eps_abs=1e-3, eps_rel=1e-3,
                      polish=False, verbose=False)
    it = np.asarray(res.iter); st = np.asarray(res.status_val)
    print(f"{dtype}: mean={it.mean():.0f} p50={np.percentile(it,50):.0f} max={it.max()} solved={np.mean(st==1):.3f}", flush=True)
    if it.max() > 300:
        worst = np.argsort(it)[-5:]
        print("  worst:", [(int(w), int(it[w]), int(st[w])) for w in worst])
