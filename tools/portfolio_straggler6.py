"""Ablation: which of (f64-resid refine steps, f64 products) is needed?"""
import sys, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import osqp_tpu.linsys.dense_inv as di
import osqp_tpu.termination as term
from osqp_tpu.linalg import mat_vec, mat_tvec

STEPS = int(os.environ.get("STEPS", "1"))
PROD64 = os.environ.get("PROD64", "0") == "1"

_orig_solve = di.solve
_orig_products = term.compute_products

def solve64(factor, A, rho_vec, rhs_x, rhs_z, x0=None, refine=False):
    t = rhs_x
    if A.shape[-2]:
        t = t + jnp.sum(A * (rho_vec * rhs_z)[:, :, None], axis=1)
    x = jnp.sum(factor["Minv"] * t[:, :, None], axis=1)
    if refine:
        f64 = lambda a: a.astype(jnp.float64)
        P64, A64 = f64(factor["P"]), f64(A)
        rho64, t64 = f64(rho_vec), f64(t)
        sig64 = f64(factor["sigma"])
        for _ in range(STEPS):
            x64 = f64(x)
            Mx = jnp.einsum("bnm,bm->bn", P64, x64) + sig64 * x64
            if A.shape[-2]:
                Ax = jnp.einsum("bmn,bn->bm", A64, x64)
                Mx = Mx + jnp.einsum("bmn,bm->bn", A64, rho64 * Ax)
            r = (t64 - Mx).astype(jnp.float32)
            x = x + jnp.sum(factor["Minv"] * r[:, :, None], axis=1)
    z = jnp.einsum("bmn,bn->bm", A, x, precision="highest")
    return x, z

di.solve = solve64

if PROD64:
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
print(f"STEPS={STEPS} PROD64={PROD64}: mean={it.mean():.0f} p50={np.percentile(it,50):.0f} max={it.max()} solved={np.mean(st==1):.3f}")
