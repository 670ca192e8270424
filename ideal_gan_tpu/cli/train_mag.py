"""CLI: magnitude R2*/PDFF training (reference train-IDEAL-mag.py)."""

from __future__ import annotations

import jax
import numpy as np

from ..parallel import data_mesh_for_batch, shard_batch
from ..train import mag
from ..train.common import batch_iterator
from ..utils import Checkpoint, DictSummaryWriter
from ..utils.preempt import PreemptionGuard
from .common import load_cohorts, setup_experiment


def main(argv=None):
    cfg = setup_experiment(mag.DEFAULTS, argv)
    _, maps, te = load_cohorts(cfg)
    n = len(maps)
    steps_per_epoch = max(n // cfg["batch_size"], 1)

    model = mag.build_model(cfg)
    step_fn, tx = mag.make_train_step(cfg, model)
    key = jax.random.PRNGKey(0)
    state = mag.init_state(cfg, model, tx, key, h=maps.shape[2],
                           w=maps.shape[3])

    mesh = data_mesh_for_batch(cfg["batch_size"])
    ckpt = Checkpoint(f"{cfg['output_dir']}/checkpoints")
    writer = DictSummaryWriter(f"{cfg['output_dir']}/summaries/train")
    start = ckpt.latest_step() or 0
    if start:
        state = ckpt.restore(jax.device_get(state), start)

    rng = np.random.default_rng(0)
    gstep = start * steps_per_epoch
    guard = PreemptionGuard()
    for ep in range(start, cfg["epochs"]):
        for (B, te_b) in batch_iterator((maps, te), cfg["batch_size"], rng):
            key, k_step = jax.random.split(key)
            state, metrics = step_fn(state, shard_batch((B, te_b), mesh),
                                     k_step)
            gstep += 1
            if gstep % 20 == 0:
                writer.write(jax.device_get(metrics), gstep, name="G_losses")
        if ((ep + 1) % cfg["epoch_ckpt"] == 0 or ep + 1 == cfg["epochs"]
                or guard.should_stop):
            ckpt.save(ep + 1, jax.device_get(state))
        if guard.should_stop:
            print(f"preempted: checkpointed epoch {ep + 1}, exiting")
            break
        print(f"epoch {ep + 1}/{cfg['epochs']} "
              f"G_loss={float(metrics['G_loss']):.6f}")
    writer.close()
    ckpt.close()


if __name__ == "__main__":
    main()
