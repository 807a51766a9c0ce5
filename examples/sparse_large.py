"""Large sparse QP via the matrix-free path (osqp_tpu.large).

A banded n=20,000 QP — LISWET-class size, impossible for the dense
device layout — solved without ever densifying P or A, then verified
independently with the f64 KKT checker.
"""

import numpy as np
import scipy.sparse as sp

from osqp_tpu.large import solve_sparse
from osqp_tpu.verify import kkt_check

n = 20_000
rng = np.random.default_rng(0)
main = 2.0 + np.abs(rng.standard_normal(n))
off = 0.5 * rng.standard_normal(n - 1)
P = sp.diags([off, main, off], [-1, 0, 1], format="csc")
A = sp.eye(n, format="csc")
q = rng.standard_normal(n)
l = np.full(n, -1.0)
u = np.full(n, 1.0)

res = solve_sparse(P, q, A, l, u, verbose=False)
x = np.asarray(res.x[0])
y = np.asarray(res.y[0])
chk = kkt_check(P, q, A, l, u, x, y)
print(
    f"n={n} nnz(P)={P.nnz} status={int(res.status_val[0])} "
    f"iters={int(res.iter[0])} obj={float(res.obj_val[0]):.6f}"
)
print(
    f"independent f64 KKT check: ok={chk['ok']} "
    f"pri={chk['pri_res']:.2e} dua={chk['dua_res']:.2e}"
)

# Stateful lifecycle over the same path: warm-started parametric
# re-solves with the reference's update semantics.
from osqp_tpu import SparseSolver

s = SparseSolver(P=P, q=q, A=A, l=l, u=u, verbose=False)
r1 = s.solve()
s.update_lin_cost(0.5 * q)  # new cost, warm-started from r1
r2 = s.solve()
print(f"re-solve: status={r2.info.status} iters={r2.info.iter} "
      f"(first solve: {r1.info.iter})")
