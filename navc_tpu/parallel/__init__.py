"""Device-mesh parallelism: data-parallel batch sharding + tensor-parallel
vocab/FFN sharding via jax.sharding + jit (GSPMD)."""

from .mesh import make_mesh, shard_batch, shard_params, batch_pspec, param_pspec  # noqa: F401
from .distributed import (  # noqa: F401
    initialize, is_primary, make_global_batch, primary_only,
    process_count, process_index)
