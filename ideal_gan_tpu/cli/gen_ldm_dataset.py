"""CLI: dataset generation from a trained PI-LDM (reference
gen_LDM_dataset.py): reverse diffusion → decoders → physics forward →
writes an npz-shard dataset (TFRecord-equivalent) of (acqs, out_maps)
pairs for downstream --DL_gen training."""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from ..train import gan as gan_tr
from ..train import ldm as ldm_tr
from ..utils import Checkpoint
from .common import load_settings, setup_experiment

DEFAULTS = dict(
    dataset="WF-IDEAL", experiment_dir="output/WF-IDEAL", n_samples=32,
    sample_batch=8, n_timesteps=200, infer_steps=200, infer_sigma=0.0,
    method="ddpm", scheduler="linear", n_ldm_filters=64, class_cond=False,
    n_classes=4, in_res=16, dim_mults=(1, 2, 4), out_name="LDM_ds",
    seed=0, n_echoes=6, lr=1e-4, beta_1=0.9, beta_2=0.999,
    epochs=1, write_dicom=False, method_prefix="m000",
)


def main(argv=None):
    cfg = setup_experiment(DEFAULTS, argv, settings_name="settings_gen.yml")
    gan_cfg = load_settings(cfg["experiment_dir"]).backfill(gan_tr.DEFAULTS)

    models = gan_tr.build_models(gan_cfg)
    _, _, txs = gan_tr.make_train_steps(gan_cfg, models)
    key = jax.random.PRNGKey(cfg["seed"])
    size = gan_cfg.get("data_size", 192)
    dummy = np.zeros((1, cfg["n_echoes"], size, size, 2), np.float32)
    gstate = gan_tr.init_state(gan_cfg, models, txs, key, dummy)
    gan_ckpt = Checkpoint(f"{cfg['experiment_dir']}/checkpoints")
    if gan_ckpt.latest_step():
        gstate = gan_ckpt.restore(jax.device_get(gstate))

    latent_hw = (size // 2 ** gan_cfg["n_downsamplings"],) * 2
    cfg["in_res"] = latent_hw[0]
    model = ldm_tr.build_model(cfg, gan_cfg["encoded_size"])
    sched = ldm_tr.build_schedule(cfg)
    _, tx = ldm_tr.make_train_step(cfg, model, sched, None)
    lstate = ldm_tr.init_state(
        cfg, model, tx, key,
        (1, latent_hw[0], latent_hw[1], gan_cfg["encoded_size"]))
    z_std = 1.0
    ldm_ckpt = Checkpoint(f"{cfg['experiment_dir']}/checkpoints_ldm")
    if ldm_ckpt.latest_step():
        restored = ldm_ckpt.restore({"state": jax.device_get(lstate),
                                     "z_std": 1.0})
        lstate, z_std = restored["state"], float(restored["z_std"])

    out_dir = Path(cfg["output_dir"]) / "generated"
    out_dir.mkdir(parents=True, exist_ok=True)
    n_written = 0
    shard = 0
    while n_written < cfg["n_samples"]:
        nb = min(cfg["sample_batch"], cfg["n_samples"] - n_written)
        key, sub = jax.random.split(key)
        acqs, maps = ldm_tr.generate_dataset(
            cfg, gan_cfg, models, gstate.params_g, model, lstate.params,
            sched, sub, n_samples=nb, latent_hw=latent_hw, z_std=z_std,
            ne=cfg["n_echoes"], method=cfg["method"])
        from ..data.records import write_shard
        write_shard(str(out_dir / f"{cfg['out_name']}_{shard:04d}"),
                    np.asarray(acqs), np.asarray(maps))
        if cfg["write_dicom"]:
            # Per-volume DICOM export (reference gen_LDM_dataset.py writes
            # PDFF/R2s/MultiEcho DICOM series per generated volume).
            from ..data.dicom import gen_ds, write_dicom, write_map_series
            from ..eval.roi import maps_to_display
            maps_np = np.asarray(maps)
            pdff, r2s, _ = maps_to_display(maps_np)
            acqs_np = np.asarray(acqs)
            for j in range(nb):
                vol = n_written + j
                vdir = out_dir / "out_dicom" / f"Volunteer-{vol:03d}"
                write_map_series(vdir, vol, pdff[j], r2s[j],
                                 cfg["method_prefix"])
                mag0 = np.hypot(acqs_np[j, 0, :, :, 0],
                                acqs_np[j, 0, :, :, 1])
                write_dicom(gen_ds(vol, cfg["method_prefix"]),
                            np.clip(mag0, 0, 1), str(vdir / "MultiEcho"),
                            "ME", level=0, slices=1)
        n_written += nb
        shard += 1
        print(f"wrote shard {shard} ({n_written}/{cfg['n_samples']})")


if __name__ == "__main__":
    main()
