from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    param_shardings,
)
from .frame_parallel import FrameParallelDetector
from . import multihost
from .dist_utils import (
    get_rank,
    get_world_size,
    is_main_process,
    all_gather_objects,
    broadcast_object,
    filesystem_gather,
    barrier,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "param_shardings",
    "get_rank",
    "get_world_size",
    "is_main_process",
    "all_gather_objects",
    "broadcast_object",
    "filesystem_gather",
    "barrier",
    "FrameParallelDetector",
    "multihost",
]
