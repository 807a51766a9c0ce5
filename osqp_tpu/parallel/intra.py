"""Intra-problem sharding: ONE large QP spread across the mesh.

SURVEY.md §2 names two TPU scaling axes; this is axis (b): when a single
QP is too large for one chip, shard the *constraint dimension m* of the
matrix-free ``cg`` backend across devices.  The per-iteration operators
partition naturally:

    A @ x           row-sharded output, no communication
    A' (rho ∘ v)    local partial products + one psum over the row axis
    norms over m    one psum

Nothing is hand-written: the arrays carry ``NamedSharding`` and XLA's
SPMD partitioner inserts the collectives (the scaling-book recipe: pick
a mesh, annotate shardings, let XLA do the rest).  The factor-free cg
backend means there is no sharded Cholesky to write.

Polish builds a dense (n+m)^2 reduced KKT and is therefore disabled on
this path (use the single-chip API for polish-grade accuracy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..batch import BatchSolveResults, solve_batch
from ..constants import OSQP_INFTY
from .mesh import make_mesh


def solve_single_sharded(
    P,
    q,
    A,
    l,
    u,
    mesh: Mesh | None = None,
    axis_name: str = "batch",
    **settings,
) -> BatchSolveResults:
    """Solve one QP with A's rows sharded over the mesh.

    P: (n, n) dense symmetric (replicated); A: (m, n); l, u: (m,).
    Rows are padded with loose all-zero constraints to a multiple of the
    mesh size (exact — rho classifies them loose, residuals are zero).
    Returns a batch-of-1 :class:`BatchSolveResults`.
    """
    if settings.get("polish"):
        raise ValueError("polish is not supported on the sharded-single path")
    settings.setdefault("linsys_solver", "cg")
    if settings["linsys_solver"] != "cg":
        raise ValueError("intra-problem sharding requires the cg backend")
    mesh = mesh or make_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size

    P = np.asarray(P)
    q = np.asarray(q)
    A = np.asarray(A)
    l = np.asarray(l)
    u = np.asarray(u)
    m, n = A.shape
    pad = (-m) % n_dev
    if pad:
        A = np.concatenate([A, np.zeros((pad, n), A.dtype)], axis=0)
        l = np.concatenate([l, np.full(pad, -OSQP_INFTY)])
        u = np.concatenate([u, np.full(pad, OSQP_INFTY)])

    row = NamedSharding(mesh, PartitionSpec(None, axis_name))
    row3 = NamedSharding(mesh, PartitionSpec(None, axis_name, None))
    repl = NamedSharding(mesh, PartitionSpec())

    A_s = jax.device_put(jnp.asarray(A)[None], row3)
    l_s = jax.device_put(jnp.asarray(l)[None], row)
    u_s = jax.device_put(jnp.asarray(u)[None], row)
    P_s = jax.device_put(jnp.asarray(P)[None], repl)
    q_s = jax.device_put(jnp.asarray(q)[None], repl)

    res = solve_batch(P_s, q_s, A_s, l_s, u_s, **settings)
    if pad:
        res = res._replace(
            y=res.y[:, :m], prim_inf_cert=res.prim_inf_cert[:, :m]
        )
    return res
