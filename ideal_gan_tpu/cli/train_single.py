"""CLI: single-subject self-supervised fitting (reference
train-IDEAL-single.py): the whole dataset is a handful of slices of one
subject, trained full-batch for thousands of epochs."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import data_mesh_for_batch, shard_batch
from ..train import single
from ..utils import Checkpoint, DictSummaryWriter
from ..utils.preempt import PreemptionGuard
from .common import load_cohorts, setup_experiment


def main(argv=None):
    cfg = setup_experiment(single.DEFAULTS, argv)
    acqs, maps, te = load_cohorts(cfg)
    # single-subject: take the data_idx'th group of 3 central slices
    i0 = cfg["data_idx"] * 3
    acqs, maps, te = acqs[i0:i0 + 3], maps[i0:i0 + 3], te[i0:i0 + 3]
    if len(acqs) == 0:
        raise SystemExit("data_idx out of range for this cohort")

    g_mag, g_pha = single.build_models(cfg)
    step_fn, tx = single.make_train_step(cfg, g_mag, g_pha)
    key = jax.random.PRNGKey(0)
    state = single.init_state(cfg, g_mag, g_pha, tx, key, h=acqs.shape[2],
                              w=acqs.shape[3])

    mesh = data_mesh_for_batch(len(acqs))
    ckpt = Checkpoint(f"{cfg['output_dir']}/checkpoints")
    writer = DictSummaryWriter(f"{cfg['output_dir']}/summaries/train")
    start = ckpt.latest_step() or 0
    if start:
        state = ckpt.restore(jax.device_get(state), start)

    batch = shard_batch((jnp.asarray(acqs), jnp.asarray(maps),
                         jnp.asarray(te)), mesh)
    guard = PreemptionGuard()
    for ep in range(start, cfg["epochs"]):
        key, k_step = jax.random.split(key)
        state, metrics = step_fn(state, batch, k_step)
        if (ep + 1) % 50 == 0:
            writer.write(jax.device_get(metrics), ep + 1, name="G_losses")
        if ((ep + 1) % cfg["epoch_ckpt"] == 0 or ep + 1 == cfg["epochs"]
                or guard.should_stop):
            ckpt.save(ep + 1, jax.device_get(state))
            print(f"epoch {ep + 1}/{cfg['epochs']} cycle="
                  f"{float(metrics['A2B2A_cycle_loss']):.6f}")
        if guard.should_stop:
            print(f"preempted: checkpointed epoch {ep + 1}, exiting")
            break
    writer.close()
    ckpt.close()


if __name__ == "__main__":
    main()
