"""Multi-chip sharding of QP batches over a jax Mesh."""

from .intra import solve_single_sharded, solve_single_sharded_sparse  # noqa: F401
from .mesh import make_mesh, solve_batch_sharded  # noqa: F401
from .multihost import (  # noqa: F401
    allreduce_summary,
    global_batch_mesh,
    host_shard,
    initialize,
)
