"""Check the dense_inv refinement gate on the portfolio batch, and the
achievable KKT-solve accuracy in f32."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from osqp_tpu.models import build_portfolio
from osqp_tpu.batch import make_config, _prepare_c
from osqp_tpu.solver import Settings
from osqp_tpu.types import DynSettings

n, k, B = 500, 50, 8
rng = np.random.default_rng(0)
Ps, qs, As, ls, us = [], [], [], [], []
for _ in range(B):
    mu = rng.standard_normal(n)
    F = rng.standard_normal((n, k)) / np.sqrt(k)
    D = np.abs(rng.standard_normal(n)) * np.sqrt(k)
    P, q, A, l, u = build_portfolio(mu, F, D, gamma=1.0)
    Ps.append(P), qs.append(q), As.append(A), ls.append(l), us.append(u)
P, q, A, l, u = [jnp.asarray(np.stack(v), jnp.float32) for v in (Ps, qs, As, ls, us)]
s = Settings(dtype="float32", eps_abs=1e-3, eps_rel=1e-3, polish=False, verbose=False)
cfg = make_config(n + k + 1 - (n + k + 1 - q.shape[1]), A.shape[1], s, jnp.float32)  # nv from shapes
nv, m = q.shape[1], A.shape[1]
cfg = make_config(nv, m, s, jnp.float32)
dyn = DynSettings.make(jnp.float32, sigma=s.sigma, alpha=s.alpha,
    eps_abs=s.eps_abs, eps_rel=s.eps_rel, eps_prim_inf=s.eps_prim_inf,
    eps_dual_inf=s.eps_dual_inf, adaptive_rho_tolerance=s.adaptive_rho_tolerance,
    delta=s.delta)
rho0 = jnp.full((B,), float(s.rho), jnp.float32)
scaled, scl, rho_state, factor, it = _prepare_c(cfg, int(s.scaling), P, q, A, l, u, rho0, dyn, None, None)
from osqp_tpu.linsys import dense_inv
print("refine flags:", np.asarray(factor["refine"]))
# inverse residual directly
M = dense_inv.form_schur(scaled.P, scaled.A, dyn.sigma, rho_state.rho_vec)
R = jnp.eye(nv, dtype=jnp.float32) - jnp.einsum("bij,bjk->bik", M, factor["Minv"], precision="highest")
print("inv resid max:", np.asarray(jnp.max(jnp.abs(R), axis=(-2, -1))))
# condition estimate of M (f64)
M64 = np.asarray(M, np.float64)
for b in range(min(B, 4)):
    w = np.linalg.eigvalsh(M64[b])
    print(f"inst {b}: kappa(M)={w.max()/w.min():.3e} lam_min={w.min():.3e} lam_max={w.max():.3e}")
# KKT solve accuracy with and without refine on a random rhs
rhs_x = jnp.asarray(rng.standard_normal((B, nv)), jnp.float32)
rhs_z = jnp.asarray(rng.standard_normal((B, m)), jnp.float32)
for refine in (False, True):
    xt, zt = dense_inv.solve(factor, scaled.A, rho_state.rho_vec, rhs_x, rhs_z, refine=refine)
    t = rhs_x + jnp.sum(scaled.A * (rho_state.rho_vec * rhs_z)[:, :, None], axis=1)
    err = np.asarray(jnp.einsum("bij,bj->bi", M, xt, precision="highest") - t)
    t64 = np.asarray(t, np.float64)
    rel = np.abs(err).max(-1) / np.abs(t64).max(-1)
    print(f"refine={refine}: KKT rel resid: {rel}")
