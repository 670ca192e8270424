"""CLI: generative-quality metrics (reference test-genMetrics.py):
sample prior/LDM latents → decode → FID / linear-MMD / SSIM / MS-SSIM
between sample pairs and against held-out data."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..eval import (FIDAccumulator, echoes_to_vgg_input, init_vgg19,
                    mmd_linear, ms_ssim, ssim)
from ..train import gan as gan_tr
from ..train import ldm as ldm_tr
from ..utils import Checkpoint
from .common import load_cohorts, load_settings, setup_experiment

DEFAULTS = dict(
    dataset="WF-IDEAL", experiment_dir="output/WF-IDEAL", n_samples=16,
    sample_batch=8, use_ldm=False, n_timesteps=200, infer_steps=50,
    infer_sigma=0.0, scheduler="linear", n_ldm_filters=64, class_cond=False,
    n_classes=4, in_res=16, dim_mults=(1, 2, 4), method="ddim", seed=0,
    n_echoes=6, lr=1e-4, beta_1=0.9, beta_2=0.999, epochs=1,
)


def main(argv=None):
    cfg = setup_experiment(DEFAULTS, argv,
                           settings_name="settings_genmetrics.yml")
    gan_cfg = load_settings(cfg["experiment_dir"]).backfill(gan_tr.DEFAULTS)
    acqs, _, te = load_cohorts(gan_cfg.overlay(
        {"synthetic": cfg["synthetic"], "dataset_dir": cfg["dataset_dir"]}))

    models = gan_tr.build_models(gan_cfg)
    _, _, txs = gan_tr.make_train_steps(gan_cfg, models)
    key = jax.random.PRNGKey(cfg["seed"])
    gstate = gan_tr.init_state(gan_cfg, models, txs, key, acqs[:1])
    gan_ckpt = Checkpoint(f"{cfg['experiment_dir']}/checkpoints")
    if gan_ckpt.latest_step():
        gstate = gan_ckpt.restore(jax.device_get(gstate))

    size = acqs.shape[2]
    latent_hw = (size // 2 ** gan_cfg["n_downsamplings"],) * 2
    cfg["in_res"] = latent_hw[0]

    if cfg["use_ldm"]:
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

        def draw(k, n):
            return ldm_tr.sample_latents(
                cfg, model, lstate.params, sched, k, n, latent_hw,
                gan_cfg["encoded_size"], z_std, method=cfg["method"])
    else:
        def draw(k, n):
            return jax.random.normal(
                k, (n, latent_hw[0], latent_hw[1], gan_cfg["encoded_size"]))

    vgg_model, vgg_vars = init_vgg19()

    @jax.jit
    def inception_like_feats(a):
        feats = vgg_model.apply(vgg_vars, echoes_to_vgg_input(a))
        pooled = [jnp.mean(f, axis=(1, 2)) for f in feats]
        return jnp.concatenate(pooled, axis=-1)

    fid = FIDAccumulator()
    samples = []
    n_drawn = 0
    while n_drawn < cfg["n_samples"]:
        nb = min(cfg["sample_batch"], cfg["n_samples"] - n_drawn)
        key, sub = jax.random.split(key)
        z = draw(sub, nb)
        maps = gan_tr.decode_maps(gan_cfg, models, gstate.params_g, z,
                                  train=False)
        from .. import physics
        # jitted: eager complex physics is unsupported on the TPU backend
        a_gen = jax.jit(physics.synthesize_mag)(
            maps, jnp.asarray(physics.te_train(cfg["n_echoes"], bs=nb)))
        samples.append(np.asarray(a_gen))
        real = acqs[n_drawn:n_drawn + nb]
        fid.update(np.asarray(inception_like_feats(jnp.asarray(real))),
                   np.asarray(inception_like_feats(a_gen)))
        n_drawn += nb
    gen = np.concatenate(samples)

    real_mag = np.abs(acqs[:len(gen), :, :, :, 0]
                      + 1j * acqs[:len(gen), :, :, :, 1])
    gen_mag = np.abs(gen[..., 0] + 1j * gen[..., 1])
    nb_pairs = len(gen) // 2
    s_pairs = np.asarray(ssim(
        jnp.asarray(gen_mag[:nb_pairs, 0, :, :, None]),
        jnp.asarray(gen_mag[nb_pairs:2 * nb_pairs, 0, :, :, None])))
    from ..eval.metrics import feature_source
    results = {
        "FID": fid.result(),
        # Provenance flag: "random-init" FID is relative-only — it must
        # never be compared against literature ImageNet-feature FID.
        "features": feature_source("vgg19"),
        "MMD": float(mmd_linear(jnp.asarray(real_mag), jnp.asarray(gen_mag))),
        "SSIM_pairs": float(np.mean(s_pairs)),
    }
    if gen_mag.shape[2] >= 176:
        msv = np.asarray(ms_ssim(
            jnp.asarray(gen_mag[:nb_pairs, 0, :, :, None]),
            jnp.asarray(gen_mag[nb_pairs:2 * nb_pairs, 0, :, :, None])))
        results["MS_SSIM_pairs"] = float(np.mean(msv))
    for k, v in results.items():
        print(f"{k}: {v:.5f}" if isinstance(v, float) else f"{k}: {v}")
    return results


if __name__ == "__main__":
    main()
