"""Numpy mixed-precision ADMM mirror of osqp_tpu's admm_step on CVXQP1_S:
bisect which f32 component sets the dual-residual floor.

Components (each f32 or f64):
  DATA  - scaled P, A, q, l, u, rho_vec storage
  SOLVE - KKT solve accuracy
  XZ    - x, z storage
  Y     - y storage (with exact compensation when f32)
  DY    - the delta_y = rho*(z_relaxed - z) arithmetic
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from osqp_tpu.io.qps import load_qps
from osqp_tpu.batch import make_config, _prepare_c
from osqp_tpu.solver import Settings
from osqp_tpu.types import DynSettings

qp = load_qps("/root/repo/tests/data/maros_mm/CVXQP1_S.qps")
Pt = np.asarray(qp.P.todense()); Pfull = Pt + np.triu(Pt, 1).T
Afull = np.asarray(qp.A.todense())
# scale in f64 exactly as the solver does
data5 = [jnp.asarray(v[None], jnp.float64) for v in (Pfull, qp.q, Afull, qp.l, qp.u)]
s = Settings(dtype="float64", eps_abs=1e-3, eps_rel=1e-3)
nv, m = qp.q.shape[0], Afull.shape[0]
cfg = make_config(nv, m, s, jnp.float64)
dyn = DynSettings.make(jnp.float64, sigma=s.sigma, alpha=s.alpha,
    eps_abs=s.eps_abs, eps_rel=s.eps_rel, eps_prim_inf=s.eps_prim_inf,
    eps_dual_inf=s.eps_dual_inf, adaptive_rho_tolerance=s.adaptive_rho_tolerance,
    delta=s.delta)
rho0 = jnp.full((1,), 0.1, jnp.float64)
scaled, scl, rho_state, factor, it0 = _prepare_c(cfg, 10, *data5, rho0, dyn, None, None)
P = np.asarray(scaled.P[0]); A = np.asarray(scaled.A[0]); q = np.asarray(scaled.q[0])
l = np.asarray(scaled.l[0]); u = np.asarray(scaled.u[0])
rho_vec = np.asarray(rho_state.rho_vec[0]); Dinv = np.asarray(scl.Dinv[0])
cinv = float(np.asarray(scl.cinv[0])); sigma = 1e-6; alpha = 1.6
print(f"cinv={cinv:.3e} rho_eq={rho_vec.max():.1f} |y-scale|?", flush=True)

M = P + sigma*np.eye(nv) + A.T @ (rho_vec[:,None]*A)
import scipy.linalg as sla
lu = sla.lu_factor(M)

def run(f32_data, f32_solve, f32_xz, f32_y, f32_dy, iters=100):
    f32 = np.float32
    cast = lambda a, on: a.astype(f32).astype(np.float64) if on else a
    Pd, Ad, qd = cast(P, f32_data), cast(A, f32_data), cast(q, f32_data)
    ld, ud, rv = cast(l, f32_data), cast(u, f32_data), cast(rho_vec, f32_data)
    riv = 1.0/rv
    Md = Pd + sigma*np.eye(nv) + Ad.T @ (rv[:,None]*Ad)
    lud = sla.lu_factor(Md)
    x = np.zeros(nv); z = np.zeros(m); y = np.zeros(m)
    for k in range(1, iters+1):
        rhs_x = sigma*x - qd
        rhs_z = z - riv*y
        t = rhs_x + Ad.T @ (rv*rhs_z)
        xt = sla.lu_solve(lud, t)
        if f32_solve:
            # emulate a solve accurate to ~1e-6 relative
            xt = xt + 3e-6*np.abs(xt).max()*np.random.default_rng(k).standard_normal(nv)
        zt = Ad @ xt
        x_new = alpha*xt + (1-alpha)*x
        zr = alpha*zt + (1-alpha)*z
        if f32_xz:
            x_new = x_new.astype(f32).astype(np.float64)
            zr = zr.astype(f32).astype(np.float64)
        v = zr + riv*y
        z_new = np.clip(v, ld, ud)
        if f32_xz:
            z_new = z_new.astype(f32).astype(np.float64)
        if f32_dy:
            dy = (rv.astype(f32)*(zr.astype(f32) - z_new.astype(f32))).astype(np.float64)
        else:
            dy = rv*(zr - z_new)
        y = y + dy
        if f32_y:
            y = y.astype(f32).astype(np.float64)  # no compensation: worst case
        x, z = x_new, z_new
    dua_vec = qd + Pd @ x + Ad.T @ y
    dua = cinv*np.abs(Dinv*dua_vec).max()
    return dua

base = run(0,0,0,0,0)
print(f"all-f64 dua@100: {base:.3e}")
for name, flags in [("data", (1,0,0,0,0)), ("solve", (0,1,0,0,0)),
                    ("xz", (0,0,1,0,0)), ("y", (0,0,0,1,0)),
                    ("dy", (0,0,0,0,1)), ("all32", (1,1,1,1,1))]:
    print(f"f32[{name}]: dua@100 = {run(*flags):.3e}", flush=True)
