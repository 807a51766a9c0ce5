"""Multi-chip sharding of QP batches over a jax Mesh."""

from .mesh import make_mesh, solve_batch_sharded  # noqa: F401
