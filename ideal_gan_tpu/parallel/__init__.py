"""Device mesh / sharding helpers."""

from .mesh import (
    batch_sharding,
    data_mesh,
    replicate,
    shard_batch,
)

__all__ = ["data_mesh", "batch_sharding", "shard_batch", "replicate"]
