"""Trace pri/dua residuals + rho per check for straggler portfolio
instances, f32 vs f64."""
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
import osqp_tpu.admm as admm
from osqp_tpu.termination import compute_products, residual_norms, tolerances

# instance 0 was a 4000-iter f32 straggler (status 2) in the B=32 run
n, k = 500, 50
rng = np.random.default_rng(0)
insts = []
for b in range(32):
    mu = rng.standard_normal(n)
    F = rng.standard_normal((n, k)) / np.sqrt(k)
    D = np.abs(rng.standard_normal(n)) * np.sqrt(k)
    insts.append(build_portfolio(mu, F, D, gamma=1.0))
sel = [0, 5, 20, 22]  # stragglers from straggler2 run
data5 = [np.stack([insts[i][j] for i in sel]) for j in range(5)]
B = len(sel)

for dt in (jnp.float32, jnp.float64):
    P, q, A, l, u = [jnp.asarray(v, dt) for v in data5]
    nv, m = q.shape[1], A.shape[1]
    s = Settings(dtype=str(jnp.dtype(dt)), eps_abs=1e-3, eps_rel=1e-3, polish=False, verbose=False)
    cfg = make_config(nv, m, s, dt)
    dyn = DynSettings.make(dt, sigma=s.sigma, alpha=s.alpha,
        eps_abs=s.eps_abs, eps_rel=s.eps_rel, eps_prim_inf=s.eps_prim_inf,
        eps_dual_inf=s.eps_dual_inf, adaptive_rho_tolerance=s.adaptive_rho_tolerance,
        delta=s.delta)
    rho0 = jnp.full((B,), float(s.rho), dt)
    scaled, scl, rho_state, factor, it = _prepare_c(cfg, int(s.scaling), P, q, A, l, u, rho0, dyn, None, None)
    c = admm.init_carry(cfg, scaled, rho_state, factor, it)
    print(f"== {jnp.dtype(dt).name} ==")
    for seg_end in range(25, 1026, 25):
        c = admm.run_segment(cfg, scaled, scl, dyn, c, seg_end)
        pr = compute_products(scaled, c.it.x, c.it.z, c.it.y)
        pri, dua = residual_norms(cfg, scl, pr)
        ep, ed = tolerances(cfg, scaled, scl, pr, c.it.z, dyn.eps_abs, dyn.eps_rel)
        act = np.asarray(c.active)
        if seg_end % 100 == 0 or not act.any():
            for b in range(B):
                print(f" k={seg_end} inst{sel[b]} act={act[b]} pri={float(pri[b]):.3e}/{float(ep[b]):.3e} dua={float(dua[b]):.3e}/{float(ed[b]):.3e} rho={float(c.rho_state.rho[b]):.3e}")
        if not act.any():
            break
