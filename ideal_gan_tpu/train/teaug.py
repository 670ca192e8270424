"""Physics-based TE-augmentation training (rebuild of
train-IDEAL-TEaug.py).

Data-free physics augmentation: each step samples a fresh random TE train,
synthesizes acquisitions from the GT maps through the forward physics op
plus Gaussian noise (train-IDEAL-TEaug.py:217-218, 614-628), and trains a
TE-conditioned generator (VET-Net by default) on the B→A→B̂ cycle with MAE
+ TV regularizers. Geometric and field-map-scaling augmentation are applied
host-side via ideal_gan_tpu.data.augment.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import physics
from ..ops import synthesize_fused
from ..losses import l1_mean, total_variation_2d
from ..models import MDWFNet, UNet, VETNet
from .common import linear_decay_schedule, make_adam

DEFAULTS = dict(
    dataset="TEaug-300", n_echoes=6, field=1.5, G_model="PM-Gen",
    out_vars="PM", n_G_filters=72, batch_size=8, epochs=100, epoch_decay=100,
    epoch_ckpt=10, lr=0.0002, beta_1=0.9, beta_2=0.9999, noise_std=0.1,
    FM_aug=False, FM_mean=1.0, bip_grad=False, data_aug_p=0.4,
    R2_TV_weight=0.0, FM_TV_weight=0.0,
    R2_SelfAttention=False, FM_SelfAttention=True,
)


class TEAugState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def build_model(cfg):
    if cfg["G_model"] in ("PM-Gen", "VET-Net"):
        return VETNet(me_layer=True, te_input=True,
                      filters=cfg["n_G_filters"],
                      r2_self_attention=cfg["R2_SelfAttention"],
                      fm_self_attention=cfg["FM_SelfAttention"])
    if cfg["G_model"] == "U-Net":
        return UNet(n_out=2, me_layer=True, te_input=True,
                    filters=cfg["n_G_filters"])
    if cfg["G_model"] == "MDWF-Net":
        return MDWFNet(filters=cfg["n_G_filters"], te_input=True)
    raise NameError(f"Unrecognized generator {cfg['G_model']!r}")


def sample_te(rng: np.random.Generator, cfg, bs: int) -> np.ndarray:
    """Host-side TE sampling matching the trainer's per-field presets
    (train-IDEAL-TEaug.py:619-628)."""
    ne = cfg["n_echoes"]
    key = jax.random.PRNGKey(int(rng.integers(2 ** 31)))
    if cfg["field"] == 3.0:
        te = physics.sample_te_train(key, ne, bs, te1_d=0.4e-3,
                                     dte_min=1.0e-3, dte_d=0.3e-3)
    elif cfg["bip_grad"]:
        te = physics.sample_te_train(key, ne, bs, dte_min=0.9e-3,
                                     dte_d=0.3e-3)
    else:
        te = physics.sample_te_train(key, ne, bs)
    return np.asarray(te)


def make_train_step(cfg, model):
    def loss_fn(params, B, te, key):
        # Synthesize acquisitions from GT maps at the sampled TEs + noise.
        A = synthesize_fused(B[:, :3], te, cfg["field"])
        A = A + cfg["noise_std"] * jax.random.normal(key, A.shape)

        out = model.apply({"params": params}, A, te[..., 0])
        if cfg["G_model"] in ("PM-Gen", "VET-Net"):
            pm = out  # (nb, 1, H, W, [FM, R2*]) MEBCRN row
        else:
            raise NotImplementedError(
                "U-Net/MDWF heads for TEaug wired in eval parity round")
        B_pm = B[:, 2:3]
        mae = jnp.mean(jnp.abs(B_pm - pm))

        # B→A→B̂ map consistency through the physics fit.
        wf_hat = physics.fit_rho(A, pm, te, field=cfg["field"])
        wf_mae = jnp.mean(jnp.abs(B[:, :2] - wf_hat))

        fm = pm[..., :1]
        r2 = pm[..., 1:]
        r2_tv = jnp.sum(total_variation_2d(r2[:, 0])) * cfg["R2_TV_weight"]
        fm_tv = jnp.sum(total_variation_2d(fm[:, 0])) * cfg["FM_TV_weight"]
        loss = mae + r2_tv + fm_tv
        return loss, {"PM_loss": mae, "WF_loss": wf_mae, "TV_R2": r2_tv,
                      "TV_FM": fm_tv, "G_loss": loss}

    total_steps = cfg.get("total_steps", cfg["epochs"])
    schedule = linear_decay_schedule(
        cfg["lr"], total_steps,
        int(cfg["epoch_decay"] * total_steps / max(cfg["epochs"], 1)))
    tx = make_adam(schedule, cfg["beta_1"], cfg["beta_2"])

    @jax.jit
    def train_step(state: TEAugState, batch, key):
        B, te = batch
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, B, te, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TEAugState(params, opt_state, state.step + 1), metrics

    return train_step, tx


def init_state(cfg, model, tx, key, h=192, w=192):
    ne = cfg["n_echoes"]
    te = physics.te_train(ne, bs=1)
    acqs = jnp.zeros((1, ne, h, w, 2), jnp.float32)
    params = model.init(key, acqs, te[..., 0])["params"]
    return TEAugState(params, tx.init(params), jnp.zeros((), jnp.int32))
