"""Head-to-head comparison of the in-vivo model families on synthetic
physics data (the reference's try-models.ipynb playground as a script).

Runs U-Net (sup), MDWF-Net, VET-Net and AI-DEAL on the same synthetic
slices for a few steps each and reports map errors vs ground truth.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ideal_gan_tpu import physics
from ideal_gan_tpu.cli.common import synthetic_dataset
from ideal_gan_tpu.parallel import data_mesh_for_batch, shard_batch
from ideal_gan_tpu.train import sup, teaug, unsup


def pdff_err(maps_pred, maps_gt):
    from ideal_gan_tpu.eval.roi import maps_to_display
    p1, _, _ = maps_to_display(np.asarray(maps_pred))
    p2, _, _ = maps_to_display(np.asarray(maps_gt))
    return float(np.mean(np.abs(p1 - p2)))


def main(n=16, h=64, steps=10):
    acqs, maps, te = synthetic_dataset(n, h=h, w=h)
    mesh = data_mesh_for_batch(8)
    key = jax.random.PRNGKey(0)
    results = {}

    # --- supervised U-Net (WF mode) -------------------------------------
    cfg = dict(sup.DEFAULTS, n_G_filters=8, batch_size=8, epochs=steps,
               out_vars="WF", G_model="U-Net")
    model = sup.build_model(cfg)
    step_fn, tx = sup.make_train_step(cfg, model)
    state = sup.init_state(cfg, model, tx, key, acqs[:1])
    for i in range(steps):
        batch = shard_batch((acqs[:8], maps[:8], te[:8]), mesh)
        state, m = step_fn(state, batch, jax.random.fold_in(key, i))
    results["U-Net (sup)"] = float(m["WF_loss"])

    # --- MDWF-Net --------------------------------------------------------
    cfg = dict(sup.DEFAULTS, n_G_filters=8, batch_size=8, epochs=steps,
               out_vars="WF-PM", G_model="multi-decod")
    model = sup.build_model(cfg)
    step_fn, tx = sup.make_train_step(cfg, model)
    state = sup.init_state(cfg, model, tx, key, acqs[:1])
    for i in range(steps):
        batch = shard_batch((acqs[:8], maps[:8], te[:8]), mesh)
        state, m = step_fn(state, batch, jax.random.fold_in(key, i))
    results["MDWF-Net"] = float(m["sup_loss"])

    # --- VET-Net (TE-aug) -------------------------------------------------
    cfg = dict(teaug.DEFAULTS, n_G_filters=8, batch_size=8, epochs=steps)
    model = teaug.build_model(cfg)
    step_fn, tx = teaug.make_train_step(cfg, model)
    state = teaug.init_state(cfg, model, tx, key, h=h, w=h)
    rng = np.random.default_rng(0)
    for i in range(steps):
        te_b = teaug.sample_te(rng, cfg, 8)
        batch = shard_batch((maps[:8], te_b), mesh)
        state, m = step_fn(state, batch, jax.random.fold_in(key, i))
    results["VET-Net"] = float(m["PM_loss"])

    # --- AI-DEAL (unsupervised) -------------------------------------------
    cfg = dict(unsup.DEFAULTS, n_G_filters=8, batch_size=8, epochs=steps)
    g_fm, g_r2 = unsup.build_models(cfg)
    step_fn, tx = unsup.make_train_step(cfg, g_fm, g_r2)
    state = unsup.init_state(cfg, g_fm, g_r2, tx, key, acqs[:1])
    for i in range(steps):
        batch = shard_batch((acqs[:8], te[:8]), mesh)
        state, m = step_fn(state, batch, jax.random.fold_in(key, i))
    results["AI-DEAL"] = float(m["A2B2A_cycle_loss"])

    print(f"\nAfter {steps} steps on {n} synthetic {h}x{h} slices:")
    for name, loss in results.items():
        print(f"  {name:16s} final loss {loss:.5f}")
    return results


if __name__ == "__main__":
    main()
