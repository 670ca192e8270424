"""Self-supervised single-subject fitting (rebuild of
train-IDEAL-single.py).

Two multi-echo UNets — G_mag on |S| (sigmoid) and G_pha on ∠S/π (linear) —
produce the 2-row magnitude/phase parameter maps consumed by the
separate-phase forward model (`synthesize_mag_phase`); the loss is the
full-batch self-consistency ‖A − Â‖ on the (tiny) single-subject dataset,
with bipolar-gradient regularizers (x-gradient sign + left/right phase
symmetry, train-IDEAL-single.py:169-173).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import physics
from ..losses import l1_mean, total_variation_2d
from ..models import UNet
from .common import linear_decay_schedule, make_adam

DEFAULTS = dict(
    dataset="WF-IDEAL", is_phantom=False, grad_mode="bipolar", n_echoes=6,
    data_idx=3, n_G_filters=36, epochs=7000, epoch_decay=24000,
    epoch_ckpt=500, lr=0.0008, beta_1=0.9, beta_2=0.999, main_loss="MSE",
    FM_TV_weight=0.0, FM_L1_weight=0.0, BP_GR_weight=0.0,
    BP_GR_sym_weight=1.0, D1_SelfAttention=False, D2_SelfAttention=True, bf16=False, remat=False,
)


class SingleState(NamedTuple):
    params_mag: Any
    params_pha: Any
    opt_state: Any
    step: jnp.ndarray


def build_models(cfg):
    """With bf16=True the two CNNs compute in bfloat16 (params stay f32;
    outputs are upcast before the f32 physics forward model)."""
    bipolar = cfg["grad_mode"] == "bipolar"
    dtype = jnp.bfloat16 if cfg.get("bf16") else jnp.float32
    n_out = 3
    g_mag = UNet(n_out=n_out, me_layer=True, filters=cfg["n_G_filters"],
                 output_activation="sigmoid", remat=cfg.get("remat", False),
                 self_attention=cfg["D1_SelfAttention"], dtype=dtype)
    g_pha = UNet(n_out=n_out + (1 if bipolar else 0), me_layer=True,
                 filters=cfg["n_G_filters"], output_activation="none",
                 remat=cfg.get("remat", False),
                 self_attention=cfg["D2_SelfAttention"], dtype=dtype)
    return g_mag, g_pha


def _loss(name):
    if name == "MSE":
        return lambda a, b: jnp.mean(jnp.square(a - b))
    if name == "MAE":
        return lambda a, b: jnp.mean(jnp.abs(a - b))
    if name == "MSLE":
        return lambda a, b: jnp.mean(jnp.square(
            jnp.log1p(jnp.maximum(a, 0)) - jnp.log1p(jnp.maximum(b, 0))))
    raise NameError(f"Unrecognized Main Loss Function {name!r}")


def make_loss_fn(cfg, g_mag, g_pha):
    """The single-subject sep-phase cycle loss (reference train_G,
    train-IDEAL-single.py:131-185) as a standalone
    `loss_fn(params=(params_mag, params_pha), A, B, te)` — shared by the
    train step and tools/model_parity.py."""
    bipolar = cfg["grad_mode"] == "bipolar"
    field = 3.0 if cfg["is_phantom"] else 1.5
    loss_fn_pt = _loss(cfg["main_loss"])

    def loss_fn(params, A, B, te):
        params_mag, params_pha = params
        a_mag = jnp.sqrt(jnp.sum(jnp.square(A), axis=-1, keepdims=True))
        a_pha = jnp.arctan2(A[..., 1:], A[..., :1]) / np.pi
        b_wf_abs = jnp.sqrt(jnp.sum(jnp.square(B[:, :2]), axis=-1,
                                    keepdims=True))  # (nb,2,H,W,1)
        b_wf_abs = jnp.transpose(b_wf_abs, (0, 4, 2, 3, 1))  # (nb,1,H,W,2)
        b_mag_msk = jnp.concatenate([b_wf_abs, b_wf_abs[..., :1]], axis=-1)
        if bipolar:
            b_pha_msk = jnp.concatenate([b_mag_msk, b_wf_abs[..., :1]], -1)
        else:
            b_pha_msk = b_mag_msk

        a2b_mag = g_mag.apply({"params": params_mag},
                              a_mag).astype(jnp.float32)
        a2b_pha = g_pha.apply({"params": params_pha},
                              a_pha).astype(jnp.float32)
        a2b_mag = jnp.where(b_mag_msk != 0.0, a2b_mag, 0.0)
        a2b_pha = jnp.where(b_pha_msk != 0.0, a2b_pha, 0.0)
        if bipolar:
            a2b_mag = jnp.concatenate(
                [a2b_mag, jnp.zeros_like(a2b_mag[..., :1])], axis=-1)
        else:
            # pad both rows to 4 channels for the sep-phase forward model
            a2b_mag = jnp.concatenate(
                [a2b_mag, jnp.zeros_like(a2b_mag[..., :1])], axis=-1)
            a2b_pha = jnp.concatenate(
                [a2b_pha, jnp.zeros_like(a2b_pha[..., :1])], axis=-1)
        a2b = jnp.concatenate([a2b_mag, a2b_pha], axis=1)  # (nb,2,H,W,4)

        a2b2a = physics.synthesize_mag_phase(a2b, te, field=field)
        a2b2a = jnp.where(A != 0.0, a2b2a, 0.0)
        cycle_loss = loss_fn_pt(A, a2b2a)

        wf_loss = loss_fn_pt(b_wf_abs, a2b[:, :1, :, :, :2])
        r2_loss = loss_fn_pt(B[:, 2:, ..., 1:], a2b[:, :1, :, :, 2:3])
        fm_loss = loss_fn_pt(B[:, 2:, ..., :1], a2b[:, 1:, :, :, 2:3])

        fm = a2b[:, 1, :, :, 2:3]
        fm_tv = jnp.sum(total_variation_2d(fm))
        fm_l1 = l1_mean(a2b[:, 1:, :, :, 2:3])
        g_loss = (cycle_loss + fm_tv * cfg["FM_TV_weight"]
                  + fm_l1 * cfg["FM_L1_weight"])

        bp_gr = jnp.asarray(0.0)
        if bipolar:
            bp = a2b[:, 1, :, :, -1:]
            dy = bp[:, 1:, :, :] - bp[:, :-1, :, :]
            dx = bp[:, :, 1:, :] - bp[:, :, :-1, :]
            bp_gr = jnp.sum(jnp.abs(dy)) - jnp.sum(jnp.sign(dx))
            wdt = bp.shape[2]
            left = a2b[:, 1, :, (wdt // 4):(wdt // 2), -1:]
            right = a2b[:, 1, :, -(wdt // 4 + 1):-(wdt // 2 + 1):-1, -1:]
            bp_gr += cfg["BP_GR_sym_weight"] * jnp.sum(jnp.abs(left + right))
            g_loss += bp_gr * cfg["BP_GR_weight"]

        return g_loss, {"A2B2A_cycle_loss": cycle_loss, "WF_loss": wf_loss,
                        "R2_loss": r2_loss, "FM_loss": fm_loss,
                        "TV_FM": fm_tv, "L1_FM": fm_l1, "BP_GR": bp_gr,
                        "G_loss": g_loss}

    return loss_fn


def make_train_step(cfg, g_mag, g_pha):
    loss_fn = make_loss_fn(cfg, g_mag, g_pha)
    schedule = linear_decay_schedule(cfg["lr"], cfg["epochs"],
                                     cfg["epoch_decay"])
    tx = make_adam(schedule, cfg["beta_1"], cfg["beta_2"])

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: SingleState, batch, key):
        A, B, te = batch
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)((state.params_mag, state.params_pha),
                                   A, B, te)
        updates, opt_state = tx.update(
            grads, state.opt_state, (state.params_mag, state.params_pha))
        params_mag, params_pha = optax.apply_updates(
            (state.params_mag, state.params_pha), updates)
        return SingleState(params_mag, params_pha, opt_state,
                           state.step + 1), metrics

    return train_step, tx


def init_state(cfg, g_mag, g_pha, tx, key, h=32, w=32):
    ne = cfg["n_echoes"]
    k1, k2 = jax.random.split(key)
    a1 = jnp.zeros((1, ne, h, w, 1), jnp.float32)
    params_mag = g_mag.init(k1, a1)["params"]
    params_pha = g_pha.init(k2, a1)["params"]
    opt_state = tx.init((params_mag, params_pha))
    return SingleState(params_mag, params_pha, opt_state,
                       jnp.zeros((), jnp.int32))
