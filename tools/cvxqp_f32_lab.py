"""CVXQP1_S f32 trajectory lab: why doesn't f32+refinement reach the
f64 trajectory (325 iters) for the equality-heavy CVXQP class?"""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from osqp_tpu.io.qps import load_qps
from osqp_tpu.batch import solve_batch

qp = load_qps("tests/data/maros_mm/CVXQP1_S.qps")
Pt = np.asarray(qp.P.todense()) if hasattr(qp.P, "todense") else np.asarray(qp.P)
P = Pt + np.triu(Pt, 1).T  # QPS stores triu
A = np.asarray(qp.A.todense()) if hasattr(qp.A, "todense") else np.asarray(qp.A)
data = [v[None] for v in (P, qp.q, A, qp.l, qp.u)]
for dt in ("float64", "float32"):
    res = solve_batch(*data, dtype=dt, eps_abs=1e-3, eps_rel=1e-3,
                      polish=True, verbose=False)
    print(f"{dt}: iter={int(np.asarray(res.iter)[0])} status={int(np.asarray(res.status_val)[0])} "
          f"pol={int(np.asarray(res.status_polish)[0])} pri={float(np.asarray(res.pri_res)[0]):.2e} "
          f"dua={float(np.asarray(res.dua_res)[0]):.2e}", flush=True)
