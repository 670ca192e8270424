"""CLI: latent diffusion on frozen PI-VAE latents (reference
train-ldm.py). Loads the PI-VAE experiment's settings.yml + checkpoint
(cross-experiment restore), computes the global latent std, trains the
denoiser, and checkpoints into checkpoints_ldm/."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..train import gan as gan_tr
from ..train import ldm as ldm_tr
from ..train.common import batch_iterator
from ..utils import Checkpoint, DictSummaryWriter
from ..utils.preempt import PreemptionGuard
from .common import load_cohorts, load_settings, setup_experiment


def main(argv=None):
    cfg = setup_experiment({**ldm_tr.DEFAULTS,
                            "dataset": "WF-IDEAL", "labels_file": ""}, argv,
                           settings_name="settings_ldm.yml")
    # Overlay: inherit the PI-VAE run's settings, backfilling LDM keys
    # (reference train-ldm.py:32-45 semantics).
    gan_cfg = load_settings(cfg["experiment_dir"])
    gan_cfg = gan_cfg.backfill(gan_tr.DEFAULTS)

    acqs, maps, te = load_cohorts(gan_cfg.overlay(
        {"synthetic": cfg["synthetic"], "dataset_dir": cfg["dataset_dir"]}))

    models = gan_tr.build_models(gan_cfg)
    _, _, txs = gan_tr.make_train_steps(gan_cfg, models)
    key = jax.random.PRNGKey(0)
    gstate = gan_tr.init_state(gan_cfg, models, txs, key, acqs[:1])
    gan_ckpt = Checkpoint(f"{cfg['experiment_dir']}/checkpoints")
    if gan_ckpt.latest_step():
        gstate = gan_ckpt.restore(jax.device_get(gstate))
        print("restored PI-VAE checkpoint")

    enc = models[0]

    @jax.jit
    def encode(a):
        out = enc.apply({"params": gstate.params_g["enc"]}, jnp.asarray(a),
                        False)
        return out if not hasattr(out, "loc") else out.loc

    # global latent std (two-pass)
    bs = max(cfg["batch_size"], 1)
    batches = [acqs[i:i + bs] for i in range(0, len(acqs), bs)]
    z_std = ldm_tr.latent_std(encode, batches)
    print(f"z_std = {z_std:.5f}")

    z0 = np.asarray(encode(acqs[:1]))
    channels = z0.shape[-1]
    cfg["in_res"] = z0.shape[1]
    model = ldm_tr.build_model(cfg, channels)
    sched = ldm_tr.build_schedule(cfg)
    step_fn, tx = ldm_tr.make_train_step(cfg, model, sched, encode)
    state = ldm_tr.init_state(cfg, model, tx, key,
                              (bs,) + z0.shape[1:])

    ckpt = Checkpoint(f"{cfg['experiment_dir']}/checkpoints_ldm")
    writer = DictSummaryWriter(f"{cfg['output_dir']}/summaries/train_ldm")
    start = ckpt.latest_step() or 0
    if start:
        restored = ckpt.restore({"state": jax.device_get(state),
                                 "z_std": z_std}, start)
        state, z_std = restored["state"], restored["z_std"]

    rng = np.random.default_rng(0)
    # steatosis-grade class conditioning from a label sheet (reference
    # train-ldm.py:91-102 reads xlsx); first column = grade per slice
    if cfg["labels_file"]:
        if cfg["labels_file"].endswith(".xlsx"):
            from ..eval.export import read_xlsx
            sheet = next(iter(read_xlsx(cfg["labels_file"]).values()))
            vals = [r[0] for r in sheet[1:] if r and r[0] is not None]
        else:
            vals = np.loadtxt(cfg["labels_file"], delimiter=",",
                              skiprows=1, usecols=0)
        labels = np.asarray(vals, np.int32)[:len(acqs)]
        if len(labels) < len(acqs):
            labels = np.pad(labels, (0, len(acqs) - len(labels)))
    else:
        labels = np.zeros((len(acqs),), np.int32)
    gstep = 0
    guard = PreemptionGuard()
    for ep in range(start, cfg["epochs"]):
        for (A, lab) in batch_iterator((acqs, labels), bs, rng):
            key, k_step = jax.random.split(key)
            z = jnp.asarray(np.asarray(encode(A)) / z_std)
            state, metrics = step_fn(state, (z, jnp.asarray(lab)), k_step)
            gstep += 1
            if gstep % 20 == 0:
                writer.write(jax.device_get(metrics), gstep, name="LDM")
        if ((ep + 1) % cfg["epoch_ckpt"] == 0 or ep + 1 == cfg["epochs"]
                or guard.should_stop):
            ckpt.save(ep + 1, {"state": jax.device_get(state),
                               "z_std": float(z_std)})
        if guard.should_stop:
            print(f"preempted: checkpointed epoch {ep + 1}, exiting")
            break
        print(f"epoch {ep + 1}/{cfg['epochs']} "
              f"eps_mse={float(metrics['loss']):.5f}")
    writer.close()
    ckpt.close()


if __name__ == "__main__":
    main()
