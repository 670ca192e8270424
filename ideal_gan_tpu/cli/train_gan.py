"""CLI: PI-VAE generative training (reference train-IDEAL-GAN.py)."""

from __future__ import annotations

import jax
import numpy as np

from ..data import ItemPool, random_echo_count, random_phase_offset
from ..data.hdf5 import mag_phase_maps
from ..data.layouts import maps_from_mebcrn
from ..parallel import data_mesh_for_batch, shard_batch
from ..train import gan as gan_tr
from ..train.common import batch_iterator
from ..utils import Checkpoint, DictSummaryWriter
from ..utils.preempt import PreemptionGuard
from .common import load_cohorts, setup_experiment


def main(argv=None):
    cfg = setup_experiment(gan_tr.DEFAULTS, argv)
    acqs, maps, te = load_cohorts(cfg)
    # maps in mag/phase rows for this trainer
    legacy = np.asarray(maps_from_mebcrn(maps))
    maps_mp = mag_phase_maps(legacy, unwrap=cfg["unwrap"])
    n = len(acqs)
    steps_per_epoch = max(n // cfg["batch_size"], 1)
    cfg["total_steps"] = steps_per_epoch * cfg["epochs"]

    models = gan_tr.build_models(cfg)
    g_step, d_step, txs = gan_tr.make_train_steps(cfg, models)
    key = jax.random.PRNGKey(0)
    state = gan_tr.init_state(cfg, models, txs, key,
                              acqs[:cfg["batch_size"]])

    mesh = data_mesh_for_batch(cfg["batch_size"])
    pool = ItemPool(cfg["pool_size"] * (not cfg["rand_ne"]))
    ckpt = Checkpoint(f"{cfg['output_dir']}/checkpoints")
    writer = DictSummaryWriter(f"{cfg['output_dir']}/summaries/train")
    start = ckpt.latest_step() or 0
    if start:
        state = ckpt.restore(jax.device_get(state), start)

    rng = np.random.default_rng(0)
    gstep = start * steps_per_epoch
    guard = PreemptionGuard()
    for ep in range(start, cfg["epochs"]):
        for (A, B, te_b) in batch_iterator((acqs, maps_mp, te),
                                           cfg["batch_size"], rng):
            key, k_step = jax.random.split(key)
            if cfg["rand_ne"]:
                ne_sel = random_echo_count(rng)
                A = A[:, :ne_sel]
                te_b = te_b[:, :ne_sel]
            if cfg["rand_ph_offset"]:
                key, k_off = jax.random.split(key)
                A, B = (np.asarray(x) for x in random_phase_offset(
                    k_off, A, B, unwrapped=cfg["unwrap"]))
            batch = shard_batch((A, B, te_b), mesh)
            state, metrics, fake = g_step(state, batch, k_step)
            if cfg["adv_train"]:
                pooled = pool(np.asarray(fake))
                for _ in range(cfg["critic_train_steps"]):
                    state, d_metrics = d_step(
                        state, batch[0],
                        shard_batch(np.asarray(pooled), mesh))
                metrics.update(d_metrics)
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
              f"G_loss={float(metrics['G_loss']):.5f}")
    writer.close()
    ckpt.close()


if __name__ == "__main__":
    main()
