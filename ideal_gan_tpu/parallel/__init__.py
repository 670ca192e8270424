"""Device mesh / sharding helpers."""

from .mesh import (
    batch_sharding,
    data_mesh,
    data_mesh_for_batch,
    replicate,
    shard_batch,
)

__all__ = ["data_mesh", "data_mesh_for_batch", "batch_sharding",
           "shard_batch", "replicate"]
