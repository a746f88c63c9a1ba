from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    param_shardings,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "param_shardings",
]
