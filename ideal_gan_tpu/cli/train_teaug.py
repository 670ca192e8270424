"""CLI: TE-augmentation training (reference train-IDEAL-TEaug.py)."""

from __future__ import annotations

import jax
import numpy as np

from ..data import bipolar_phase_row, random_fm_scale, random_geometric
from ..parallel import data_mesh_for_batch, shard_batch
from ..train import teaug
from ..train.common import batch_iterator
from ..utils import Checkpoint, DictSummaryWriter
from ..utils.preempt import PreemptionGuard
from .common import (load_cohorts, setup_experiment,
                     warn_f32_compiler_crash)


def main(argv=None):
    cfg = setup_experiment(teaug.DEFAULTS, argv)
    warn_f32_compiler_crash(cfg)
    _, maps, _ = load_cohorts(cfg)
    n = len(maps)
    steps_per_epoch = max(n // cfg["batch_size"], 1)
    cfg["total_steps"] = steps_per_epoch * cfg["epochs"]

    model = teaug.build_model(cfg)
    r2_model = (teaug.build_r2_model(cfg) if cfg["G_model"] == "2U-Net"
                else None)
    step_fn, tx = teaug.make_train_step(cfg, model, r2_model)
    r2_step_fn = (teaug.make_r2_train_step(cfg, model, r2_model, tx)
                  if r2_model is not None else None)
    key = jax.random.PRNGKey(0)
    state = teaug.init_state(cfg, model, tx, key, h=maps.shape[2],
                             w=maps.shape[3], r2_model=r2_model)

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
        for (B,) in batch_iterator((maps,), cfg["batch_size"], rng):
            key, k_aug, k_step = jax.random.split(key, 3)
            if rng.random() <= cfg["data_aug_p"]:
                B = np.asarray(random_geometric(k_aug, B))
                if cfg["FM_aug"]:
                    B = np.asarray(random_fm_scale(k_aug, B,
                                                   mean=cfg["FM_mean"]))
            if cfg["bip_grad"]:
                B = np.asarray(bipolar_phase_row(k_aug, B))
            te = teaug.sample_te(rng, cfg, len(B))
            batch = shard_batch((B, te), mesh)
            state, metrics = step_fn(state, batch, k_step)
            if r2_step_fn is not None:
                # 2U-Net: alternate G_A2R2 training with G_A2B frozen
                # (reference train_step, train-IDEAL-TEaug.py:424-429)
                state, r2m = r2_step_fn(state, batch, k_step)
                metrics.update(r2m)
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
              f"PM_loss={float(metrics['PM_loss']):.6f}")
    writer.close()
    ckpt.close()


if __name__ == "__main__":
    main()
