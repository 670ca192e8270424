"""Multi-host (TPU pod) execution helpers.

The reference is strictly single-GPU (SURVEY §2.8); single-slice DP was
this framework's ceiling through round 2. This module adds the pod path:

- `initialize_distributed()` — one call at the top of every trainer CLI.
  On a pod (or any multi-process launch) it wires the JAX distributed
  runtime so `jax.devices()` spans all hosts; on a single host it is a
  no-op. Configuration comes from the standard launcher environment
  (`COORDINATOR_ADDRESS`, `NUM_PROCESSES`, `PROCESS_ID`,
  `LOCAL_DEVICE_IDS`) or TPU metadata auto-detection (arguments override).
- `global_data_mesh()` — 1-D 'data' mesh over ALL processes' devices.
- `process_batch_slice(n)` — the half-open index range of the global
  batch this process should load (per-process data sharding: each host
  reads only its shard from disk).
- `host_local_to_global(batch, mesh)` — assembles per-process host-local
  numpy shards into global jax.Arrays sharded over 'data'
  (`jax.make_array_from_process_local_data`). On a single process it is
  exactly `shard_batch`.

Pod training loop shape (see docs/POD.md):

    initialize_distributed()
    mesh = global_data_mesh()
    lo, hi = process_batch_slice(cfg["batch_size"])
    for step_batch_np in loader(range(lo, hi)):        # host-local read
        batch = host_local_to_global(step_batch_np, mesh)
        state, metrics = train_step(state, batch, key)  # psum over ICI/DCN

Checkpointing: `utils/checkpoint.py`'s orbax writer is already
multi-process-safe (orbax coordinates the write across hosts); metrics
printing should be gated on `jax.process_index() == 0`.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_log = logging.getLogger(__name__)
_initialized = False


def _tpu_present() -> bool:
    """TPU hardware visible on this host, checked WITHOUT touching the
    jax backend (device probes before jax.distributed.initialize() would
    make multi-process init impossible): TPU chips appear as /dev/accel*
    on Cloud TPU VMs; libtpu's presence is the fallback signal."""
    import glob
    import importlib.util
    if glob.glob("/dev/accel*"):
        return True
    return importlib.util.find_spec("libtpu") is not None


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> bool:
    """Initialize the JAX distributed runtime for multi-host execution.

    Returns True when a multi-process runtime was (or already is) live,
    False for the single-process no-op. Safe to call unconditionally and
    repeatedly from every trainer CLI. Explicit arguments override the
    `COORDINATOR_ADDRESS` / `NUM_PROCESSES` / `PROCESS_ID` /
    `LOCAL_DEVICE_IDS` environment; with neither present, TPU-pod
    metadata auto-detection is attempted only when a TPU platform is
    actually selected (jax.distributed.initialize() with no args)."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    # NOTE: deliberately no jax.process_count()/jax.devices() probe here —
    # touching the backend before jax.distributed.initialize() would make
    # the real multi-process init impossible.

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    if local_device_ids is None and "LOCAL_DEVICE_IDS" in os.environ:
        local_device_ids = [int(x) for x in
                            os.environ["LOCAL_DEVICE_IDS"].split(",")]

    if coordinator_address is None:
        # No launcher env. On a real TPU pod slice, jax auto-detects the
        # topology from TPU metadata. Detection must NOT rely on
        # JAX_PLATFORMS alone: on a standard Cloud TPU VM libtpu is
        # auto-discovered and that variable is unset — gating on it would
        # silently train an independent copy per host (each believing it
        # is process 0). Attempt auto-init when the platform names tpu,
        # or when it is unset and TPU hardware is visible; an explicitly
        # non-TPU platform (cpu, axon, ...) stays single-process.
        platform = os.environ.get("JAX_PLATFORMS", "").lower()
        if "tpu" in platform or (not platform and _tpu_present()):
            try:
                jax.distributed.initialize()
                _initialized = True
            except Exception as e:  # single-host TPU, no metadata, ...
                _log.debug("distributed auto-init unavailable: %s", e)
                return False
            return jax.process_count() > 1
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True
    _log.info("distributed runtime: process %d/%d, %d global / %d local "
              "devices", jax.process_index(), jax.process_count(),
              len(jax.devices()), len(jax.local_devices()))
    return True


def global_data_mesh(model: int = 1) -> Mesh:
    """1-D 'data' mesh over ALL processes' devices (the global device
    list is identical on every process after `initialize_distributed`)."""
    devices = np.asarray(jax.devices())
    if model > 1:
        return Mesh(devices.reshape(len(devices) // model, model),
                    ("data", "model"))
    return Mesh(devices, ("data",))


def process_batch_slice(global_batch: int,
                        process_id: int | None = None) -> tuple[int, int]:
    """[lo, hi) of the global batch this process loads. The global batch
    must divide evenly by the process count (jax requires equal
    per-process addressable shards on the batch axis)."""
    n = jax.process_count()
    pid = jax.process_index() if process_id is None else process_id
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} is not divisible by the "
            f"{n}-process pod; pick a multiple of {n}")
    per = global_batch // n
    return pid * per, (pid + 1) * per


def host_local_to_global(batch, mesh: Mesh):
    """Per-process host-local numpy shards → global jax.Arrays sharded
    over the mesh's 'data' axis. Single-process: a plain device_put with
    the batch sharding (identical semantics)."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)
