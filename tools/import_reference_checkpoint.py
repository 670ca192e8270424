"""Import a trained TF-reference experiment into this framework.

Reads the reference's experiment directory (settings.yml written by
py.args_to_yaml + `checkpoints/` written by tf2lib's Checkpoint —
/root/reference/tf2lib/utils/utils.py:4-31), rebuilds the matching Keras
model(s), restores the latest checkpoint, converts the weights through
`ideal_gan_tpu.bridge`, and writes one `.npz` param file per model —
directly loadable into the corresponding Flax module:

    python tools/import_reference_checkpoint.py \
        --experiment_dir /path/to/output/my-run --family unsup \
        --out /path/to/converted

    # then, in Python:
    from ideal_gan_tpu.bridge import load_params_npz
    params = load_params_npz("converted/G_A2B.npz")
    out = g_fm.apply(params, acqs, train=False)

Families: sup (G_A2B — U-Net / MDWF / PM-Gen per settings), unsup
(G_A2B field-map UNet + G_A2R2 R2* UNet), teaug (G_A2B model zoo
[+ G_A2R2 for 2U-Net]). The Keras models are built through the reference
`DLlib` (loaded via `bridge.refload`, which shims tfa/tfp when absent);
checkpoints restore with `expect_partial()` so optimizer slots in the
checkpoint are ignored.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import os  # noqa: E402

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def load_settings(experiment_dir: Path) -> dict:
    import yaml
    with open(experiment_dir / "settings.yml") as f:
        return yaml.safe_load(f)


def _keras_models_for_family(ref, family: str, cfg: dict, hw: int,
                             n_echoes: int):
    """Build the reference Keras models exactly as the train scripts do.
    Returns {checkpoint_key: (keras_model, convert_fn_name)}."""
    filters = cfg.get("n_G_filters", 72)
    if family == "sup":
        g_model = cfg.get("G_model", "multi-decod")
        out_vars = cfg.get("out_vars", "WF")
        if g_model == "multi-decod" and out_vars == "WF-PM":
            km = ref.MDWF_Generator(
                (hw, hw, n_echoes * 2), filters=filters,
                WF_self_attention=cfg.get("D1_SelfAttention", False),
                R2_self_attention=cfg.get("D2_SelfAttention", True),
                FM_self_attention=cfg.get("D3_SelfAttention", True))
            return {"G_A2B": (km, "convert_mdwf_generator")}
        if g_model == "multi-decod":
            km = ref.PM_Generator(
                (hw, hw, n_echoes * 2), ME_layer=False, filters=filters,
                R2_self_attention=cfg.get("D1_SelfAttention", False),
                FM_self_attention=cfg.get("D2_SelfAttention", True))
            return {"G_A2B": (km, "convert_pm_generator")}
        if g_model == "U-Net":
            if out_vars == "WFc":
                n_out, act = 4, "tanh"
            elif out_vars == "WF-PM":
                n_out, act = 4, "relu"
            else:
                n_out, act = 2, "relu"
            km = ref.UNet((hw, hw, n_echoes * 2), n_out=n_out,
                          filters=filters, output_activation=act,
                          self_attention=cfg.get("D1_SelfAttention", False))
            return {"G_A2B": (km, "convert_unet")}
        raise SystemExit(f"unsupported sup G_model {g_model!r}")
    if family == "unsup":
        g_fm = ref.UNet((None, hw, hw, 2), ME_layer=True, filters=filters,
                        self_attention=cfg.get("D1_SelfAttention", True))
        g_r2 = ref.UNet((None, hw, hw, 1), ME_layer=True, filters=filters,
                        output_activation="sigmoid",
                        output_initializer="he_uniform",
                        self_attention=cfg.get("D2_SelfAttention", False))
        return {"G_A2B": (g_fm, "convert_unet"),
                "G_A2R2": (g_r2, "convert_unet")}
    if family == "teaug":
        g_model = cfg.get("G_model", "VET-Net")
        te_kw = dict(te_input=True, te_shape=(n_echoes,))
        if g_model in ("PM-Gen", "VET-Net", "multi-decod"):
            km = ref.PM_Generator(
                (n_echoes, hw, hw, 2), ME_layer=True, filters=filters,
                R2_self_attention=cfg.get("R2_SelfAttention", False),
                FM_self_attention=cfg.get("FM_SelfAttention", True),
                **te_kw)
            return {"G_A2B": (km, "convert_pm_generator")}
        if g_model in ("U-Net", "2U-Net"):
            n_out = 1 if g_model == "2U-Net" else 2
            models = {"G_A2B": (ref.UNet(
                (n_echoes, hw, hw, 2), n_out=n_out, ME_layer=True,
                filters=filters,
                self_attention=cfg.get("FM_SelfAttention", True), **te_kw),
                "convert_unet")}
            if g_model == "2U-Net":
                models["G_A2R2"] = (ref.UNet(
                    (n_echoes, hw, hw, 1), n_out=1, ME_layer=True,
                    filters=filters, output_activation="sigmoid",
                    self_attention=cfg.get("R2_SelfAttention", False),
                    **te_kw), "convert_unet")
            return models
        if g_model == "MDWF-Net":
            km = ref.MDWF_Generator(
                (hw, hw, n_echoes * 2), filters=filters,
                WF_self_attention=cfg.get("WF_SelfAttention", False),
                R2_self_attention=cfg.get("R2_SelfAttention", False),
                FM_self_attention=cfg.get("FM_SelfAttention", True),
                **te_kw)
            return {"G_A2B": (km, "convert_mdwf_generator")}
        raise SystemExit(f"unsupported teaug G_model {g_model!r}")
    raise SystemExit(f"unknown family {family!r}")


def _flax_model_for(family: str, key: str, cfg: dict):
    from ideal_gan_tpu.train import sup, teaug, unsup
    if family == "sup":
        return sup.build_model({**sup.DEFAULTS, **cfg})
    if family == "unsup":
        g_fm, g_r2 = unsup.build_models({**unsup.DEFAULTS, **cfg})
        return g_fm if key == "G_A2B" else g_r2
    if family == "teaug":
        tcfg = {**teaug.DEFAULTS, **cfg}
        return (teaug.build_model(tcfg) if key == "G_A2B"
                else teaug.build_r2_model(tcfg))
    raise SystemExit(family)


def _example_inputs(family: str, key: str, cfg: dict, hw: int, ne: int):
    import jax.numpy as jnp
    if family == "sup":
        return (jnp.zeros((1, hw, hw, 2 * ne), jnp.float32),)
    n_ch = 1 if key == "G_A2R2" else 2
    x = jnp.zeros((1, ne, hw, hw, n_ch), jnp.float32)
    if family == "teaug":
        if cfg.get("G_model") == "MDWF-Net":
            return (jnp.zeros((1, hw, hw, 2 * ne), jnp.float32),
                    jnp.zeros((1, ne), jnp.float32))
        return (x, jnp.zeros((1, ne), jnp.float32))
    return (x,)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiment_dir", required=True)
    ap.add_argument("--family", required=True,
                    choices=["sup", "unsup", "teaug"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--data_size", type=int, default=0,
                    help="override spatial size (default: settings.yml)")
    ap.add_argument("--reference_root", default=str(REPO.parent
                                                    / "reference"))
    args = ap.parse_args(argv)

    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import tensorflow as tf

    from ideal_gan_tpu import bridge

    exp = Path(args.experiment_dir)
    cfg = load_settings(exp)
    hw = args.data_size or int(cfg.get("data_size", 192))
    ne = int(cfg.get("n_echoes", 6))
    ref = bridge.load_reference_dlmodule(args.reference_root)

    models = _keras_models_for_family(ref, args.family, cfg, hw, ne)
    ckpt = tf.train.Checkpoint(**{k: m for k, (m, _) in models.items()})
    latest = tf.train.latest_checkpoint(str(exp / "checkpoints"))
    if latest is None:
        raise SystemExit(f"no checkpoint found in {exp / 'checkpoints'}")
    ckpt.restore(latest).expect_partial()
    print(f"restored {latest}")

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    for key, (km, conv_name) in models.items():
        conv = getattr(bridge, conv_name)
        fm = _flax_model_for(args.family, key, cfg)
        example = _example_inputs(args.family, key, cfg, hw, ne)
        variables = conv(km, fm, *example)
        path = out_dir / f"{key}.npz"
        bridge.save_params_npz(str(path), variables)
        n = sum(int(np.prod(v.shape)) for v in
                jax.tree_util.tree_leaves(variables))
        print(f"wrote {path} ({n:,} params)")


if __name__ == "__main__":
    main()
