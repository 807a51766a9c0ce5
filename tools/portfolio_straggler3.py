"""Is the f32 stall measurement noise or a fixed-point floor?
Patch compute_products to evaluate the products in f64 (iterates stay f32)."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import osqp_tpu.termination as term
from osqp_tpu.linalg import mat_vec, mat_tvec

_orig = term.compute_products

def hi_products(data, x, z, y):
    f64 = lambda a: a.astype(jnp.float64)
    Ax = mat_vec(f64(data.A), f64(x))
    Px = mat_vec(f64(data.P), f64(x))
    Aty = mat_tvec(f64(data.A), f64(y))
    d = x.dtype
    return term.Products(
        Ax=Ax.astype(d), Px=Px.astype(d), Aty=Aty.astype(d),
        pri_vec=(Ax - f64(z)).astype(d),
        dua_vec=(f64(data.q) + Px + Aty).astype(d),
    )

term.compute_products = hi_products
# admm imports compute_products directly? check
import osqp_tpu.admm as admm
for mod in (admm,):
    if hasattr(mod, "compute_products"):
        mod.compute_products = hi_products

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
res = solve_batch(*data, dtype="float32", eps_abs=1e-3, eps_rel=1e-3,
                  polish=False, verbose=False)
it = np.asarray(res.iter); st = np.asarray(res.status_val)
print(f"f32 + f64 products: mean={it.mean():.0f} p50={np.percentile(it,50):.0f} max={it.max()} solved={np.mean(st==1):.3f}")
