"""Shared training machinery.

- `linear_decay_schedule`: constant LR until step_decay, then linear to 0
  (reference LinearDecay, DLlib/module.py:945-965).
- `make_adam`: Adam with the reference's (β1, β2) defaults and optional
  global-norm clipping (train-IDEAL-unsup.py:320).
- `TrainLoop`: the epoch skeleton every trainer shares — epoch counter in
  the checkpointed state (crash-resume semantics of the reference's ep_cnt,
  train-sup.py:456-482), periodic checkpointing, dict summaries, and
  data-parallel batch sharding over the device mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable, Mapping

import jax
import numpy as np
import optax

from ..parallel import data_mesh, shard_batch
from ..utils import Checkpoint, DictSummaryWriter


def linear_decay_schedule(lr: float, total_steps: int,
                          step_decay: int) -> optax.Schedule:
    if total_steps <= step_decay:
        return optax.constant_schedule(lr)

    def schedule(step):
        import jax.numpy as jnp
        frac = (step - step_decay) / max(total_steps - step_decay, 1)
        return jnp.where(step >= step_decay,
                         lr * (1.0 - frac), lr).astype(jnp.float32)

    return schedule


def make_adam(schedule, beta_1: float = 0.9, beta_2: float = 0.9999,
              clip_norm: float | None = None) -> optax.GradientTransformation:
    tx = optax.adam(schedule, b1=beta_1, b2=beta_2)
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def accumulate_microbatch_grads(grad_fn, params, batch, key, micro: int):
    """Exact gradient accumulation over micro-batches via `lax.scan`.

    Purpose-built for the XLA TPU compiler crash on the f32 384²·b8
    backward (docs/DESIGN.md "f32 compiler crash"): the scan body's
    backward is a batch-`micro` computation whose temp-buffer plan fits
    HBM, and the temps are reused across iterations — so a batch the
    compiler cannot plan monolithically trains with identical math.

    `grad_fn(params, chunk, key) -> ((loss, metrics_dict), grads)` is the
    caller's per-chunk value_and_grad closure; the caller is responsible
    for making the summed-then-averaged chunk results equal the full-batch
    quantities (batch-MEAN terms decompose as-is over equal chunks;
    batch-SUM terms — the TV and L1_mean regularizers, which sum
    per-item reductions over the batch — must be pre-scaled by the
    chunk count, see `make_loss_fn(tv_scale=...)`).

    `batch` is a pytree of arrays sharing leading dim nb; nb % micro must
    be 0. Returns ((loss, metrics), grads) averaged over the nb//micro
    chunks. All accumulation is in the grads' own dtype (f32 params ⇒ f32
    accumulation).
    """
    import jax.numpy as jnp
    from jax import lax

    nb = jax.tree.leaves(batch)[0].shape[0]
    if nb % micro:
        raise ValueError(f"batch {nb} not divisible by microbatch {micro}")
    n_chunks = nb // micro
    if n_chunks == 1:
        return grad_fn(params, batch, key)
    chunks = jax.tree.map(
        lambda x: x.reshape((n_chunks, micro) + x.shape[1:]), batch)
    keys = jax.random.split(key, n_chunks)

    out_shapes = jax.eval_shape(
        grad_fn, params, jax.tree.map(lambda x: x[0], chunks), keys[0])
    zeros = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), out_shapes)

    def body(carry, inp):
        chunk, k = inp
        out = grad_fn(params, chunk, k)
        return jax.tree.map(jnp.add, carry, out), None

    acc, _ = lax.scan(body, zeros, (chunks, keys))
    inv = 1.0 / n_chunks
    return jax.tree.map(lambda x: (x * inv).astype(x.dtype), acc)


def batch_iterator(arrays, batch_size: int, rng: np.random.Generator,
                   shuffle: bool = True, drop_remainder: bool = True):
    """Host-side shuffled batch iterator over aligned numpy arrays."""
    n = len(arrays[0])
    idx = rng.permutation(n) if shuffle else np.arange(n)
    stop = n - (n % batch_size) if drop_remainder else n
    for i in range(0, stop, batch_size):
        sel = idx[i:i + batch_size]
        yield tuple(a[sel] for a in arrays)


@dataclasses.dataclass
class TrainLoop:
    """Epoch loop: resume → (aug → step → summaries) → periodic ckpt.

    step_fn(state, batch, key) -> (state, metrics_dict); state must be a
    pytree with an integer `step` leaf.
    """

    step_fn: Callable
    output_dir: str
    epoch_ckpt: int = 10
    summary_name: str = "G_losses"
    seed: int = 0

    def __post_init__(self):
        self.mesh = data_mesh()
        self.ckpt = Checkpoint(f"{self.output_dir}/checkpoints")
        self.writer = DictSummaryWriter(f"{self.output_dir}/summaries/train")
        self._np_rng = np.random.default_rng(self.seed)

    def resume(self, state):
        """Crash-resume: (state, start_epoch)."""
        step = self.ckpt.latest_step()
        if step is None:
            return state, 0
        return self.ckpt.restore(state, step), step

    def run(self, state, epochs: int, batches_fn: Callable[[], Iterable],
            key: jax.Array, hooks: Mapping[str, Callable] | None = None):
        """batches_fn() yields per-epoch batch iterables; hooks:
        {'on_epoch_end': fn(epoch, state)}."""
        hooks = hooks or {}
        state, start_ep = self.resume(state)
        global_step = 0
        for ep in range(epochs):
            if ep < start_ep:
                continue
            for batch in batches_fn():
                key, sub = jax.random.split(key)
                batch = shard_batch(batch, self.mesh)
                state, metrics = self.step_fn(state, batch, sub)
                global_step += 1
                if global_step % 20 == 0:
                    self.writer.write(
                        jax.device_get(metrics), global_step,
                        name=self.summary_name)
            if "on_epoch_end" in hooks:
                hooks["on_epoch_end"](ep, state)
            if (ep + 1) % self.epoch_ckpt == 0 or ep + 1 == epochs:
                self.ckpt.save(ep + 1, jax.device_get(state))
        return state
