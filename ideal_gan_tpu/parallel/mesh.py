"""Device mesh and sharding helpers.

The reference has no distribution of any kind (single GPU, SURVEY §2.8);
the TPU-native design scales by data parallelism over a 1-D mesh
('data' axis): batches are sharded on their leading axis, parameters and
optimizer state are replicated, and jit emits the gradient all-reduce over
ICI. A second 'model' axis is reserved in `data_mesh(model=...)` for future
tensor-parallel layouts (models here are ≤ ~30M params, so DP is the
primary axis).

The physics ops are voxel-parallel with zero cross-voxel communication, so
under DP the only collective in the train step is the grad psum.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None, model: int = 1) -> Mesh:
    """1-D (or 2-D with a model axis) device mesh over available devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devs = np.asarray(devices[:n])
    if model > 1:
        return Mesh(devs.reshape(n // model, model), ("data", "model"))
    return Mesh(devs, ("data",))


def data_mesh_for_batch(batch_size: int, model: int = 1) -> Mesh:
    """Largest 'data' mesh that divides the batch size evenly (so small
    full-batch trainers still shard cleanly). Warns when the batch size
    forces idle devices (e.g. the GAN default batch_size=1 on an 8-chip
    slice trains single-device) so the degradation is never silent."""
    import logging
    n_avail = len(jax.devices())
    n = n_avail
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n < n_avail:
        logging.getLogger(__name__).warning(
            "data_mesh_for_batch: batch_size=%d is not divisible by the "
            "%d available devices — using a %d-device mesh (%d devices "
            "idle). Pick a batch size divisible by the device count to "
            "use the full slice.", batch_size, n_avail, n, n_avail - n)
    return data_mesh(n, model=model)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params / opt state / scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in a pytree with its leading axis sharded over
    'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
