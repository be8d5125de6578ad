"""Multi-chip parallelism: meshes, sharding, and DP training steps."""

from .data_parallel import make_shard_map_train_step
from .mesh import (
    DATA_AXIS,
    data_sharding,
    initialize_distributed,
    make_mesh,
    put_replicated,
    replicate,
    replicated_sharding,
    shard_rays,
)

__all__ = [
    "DATA_AXIS",
    "data_sharding",
    "initialize_distributed",
    "make_mesh",
    "make_shard_map_train_step",
    "put_replicated",
    "replicate",
    "replicated_sharding",
    "shard_rays",
]
