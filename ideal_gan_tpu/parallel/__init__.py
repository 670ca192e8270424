"""Device mesh / sharding helpers."""

from .mesh import (
    batch_sharding,
    data_mesh,
    data_mesh_for_batch,
    replicate,
    shard_batch,
)
from .serving import make_sharded_fit

__all__ = ["data_mesh", "data_mesh_for_batch", "batch_sharding",
           "shard_batch", "replicate", "make_sharded_fit"]
