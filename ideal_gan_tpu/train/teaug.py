"""Physics-based TE-augmentation training (rebuild of
train-IDEAL-TEaug.py).

Data-free physics augmentation: each step samples a fresh random TE train,
synthesizes acquisitions from the GT maps through the forward physics op
plus Gaussian noise (train-IDEAL-TEaug.py:217-218, 614-628), and trains a
TE-conditioned generator on the B→A→B̂ cycle with MAE + TV regularizers.
Geometric and field-map-scaling augmentation are applied host-side via
ideal_gan_tpu.data.augment.

Model zoo (reference train-IDEAL-TEaug.py:152-195):
- "PM-Gen"/"VET-Net": PM_Generator with ConvLSTM front + TE-AdaIN.
- "U-Net": single UNet predicting the PM rows (out_vars="PM") or the
  water/fat magnitudes (out_vars="WF").
- "MDWF-Net": MDWF_Generator predicting [|W|,|F|, R2*, FM] jointly
  (out_vars="WF-PM"). The reference constructs this model but its WF-PM
  loss branch is commented out (train-IDEAL-TEaug.py:314-340) — here the
  branch is implemented as written there.
- "2U-Net": a second UNet `G_A2R2` estimates R2* from echo magnitudes,
  trained by its own step with the FM net frozen and vice versa
  (train-IDEAL-TEaug.py:280-288, 364-420).

`sel_weight` enables the phase-coherence selective weighting over the
first three echoes (train-IDEAL-TEaug.py:224-232). Divergence
(documented): the reference applies `**= sel_weight_pwr` inside the echo
accumulation loop (re-exponentiating partial sums each iteration) —
here the power is applied once to the accumulated weight.

Divergence (documented): the reference's U-Net PM branch rescales the
tanh field-map head as (FM−0.5)·2 — a leftover from a sigmoid-era head
that maps tanh output into [−3, 1] — and flips the PM channel order to
[R2*, FM] before `get_rho`, which reads [FM, R2*]
(train-IDEAL-TEaug.py:296-304). Here the U-Net head keeps [FM, R2*]
order with FM=tanh and R2*=(tanh+1)/2 ∈ [0,1].
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import physics
from ..ops import synthesize_fused
from ..losses import l1_mean, total_variation_2d
from ..models import MDWFNet, UNet, VETNet
from .common import (accumulate_microbatch_grads,
                     linear_decay_schedule, make_adam)

DEFAULTS = dict(
    dataset="TEaug-300", n_echoes=6, field=1.5, G_model="PM-Gen",
    out_vars="PM", n_G_filters=72, batch_size=8, epochs=100, epoch_decay=100,
    epoch_ckpt=10, lr=0.0002, beta_1=0.9, beta_2=0.9999, noise_std=0.1,
    FM_aug=False, FM_mean=1.0, bip_grad=False, data_aug_p=0.4, bf16=False,
    remat=False, microbatch=0,
    R2_TV_weight=0.0, FM_TV_weight=0.0, sel_weight=False, sel_weight_pwr=1.0,
    te_input=True,
    R2_SelfAttention=False, FM_SelfAttention=True,
)


class TEAugState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    params_r2: Any = None   # 2U-Net second generator (G_A2R2)
    opt_r2: Any = None


def build_model(cfg):
    """Primary generator G_A2B (reference train-IDEAL-TEaug.py:152-195).
    With bf16=True the CNN computes in bfloat16 (params stay f32; the
    physics ops always run f32/c64)."""
    dtype = jnp.bfloat16 if cfg.get("bf16") else jnp.float32
    if cfg["G_model"] in ("PM-Gen", "VET-Net", "multi-decod"):
        return VETNet(me_layer=True, te_input=cfg.get("te_input", True),
                      filters=cfg["n_G_filters"],
                      remat=cfg.get("remat", False),
                      r2_self_attention=cfg["R2_SelfAttention"],
                      fm_self_attention=cfg["FM_SelfAttention"],
                      dtype=dtype)
    if cfg["G_model"] in ("U-Net", "2U-Net"):
        n_out = 1 if cfg["G_model"] == "2U-Net" else 2
        return UNet(n_out=n_out, me_layer=True,
                    te_input=cfg.get("te_input", True),
                    filters=cfg["n_G_filters"],
                    remat=cfg.get("remat", False),
                    self_attention=cfg["FM_SelfAttention"], dtype=dtype)
    if cfg["G_model"] == "MDWF-Net":
        return MDWFNet(filters=cfg["n_G_filters"],
                       te_input=cfg.get("te_input", True),
                       remat=cfg.get("remat", False),
                       r2_self_attention=cfg["R2_SelfAttention"],
                       fm_self_attention=cfg["FM_SelfAttention"],
                       dtype=dtype)
    raise NameError(f"Unrecognized generator {cfg['G_model']!r}")


def build_r2_model(cfg):
    """Second UNet G_A2R2 for the 2U-Net config: sigmoid R2* head on echo
    magnitudes (train-IDEAL-TEaug.py:176-184)."""
    dtype = jnp.bfloat16 if cfg.get("bf16") else jnp.float32
    return UNet(n_out=1, me_layer=True, te_input=cfg.get("te_input", True),
                filters=cfg["n_G_filters"], output_activation="sigmoid",
                remat=cfg.get("remat", False),
                self_attention=cfg["R2_SelfAttention"], dtype=dtype)


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


def _selective_weight(cfg, B, A, te):
    """Phase-coherence selective weighting (train-IDEAL-TEaug.py:224-232):
    per-voxel weight from the agreement between each of the first three
    observed echo phases and the phase predicted by the GT field-map plus
    the GT water phase."""
    sel_w = 0.0
    for echo in range(3):
        obs = jnp.arctan2(A[:, echo:echo + 1, :, :, 1:],
                          A[:, echo:echo + 1, :, :, :1])
        phi = (2.0 * jnp.pi * B[:, 2:3, :, :, :1] * physics.FM_SC
               * te[0, echo, 0])
        phi = phi + jnp.arctan2(B[:, :1, :, :, 1:], B[:, :1, :, :, :1])
        sel_w = sel_w + (1.0 / 6.0) * jnp.cos(obs - phi) + (1.0 / 6.0)
    return sel_w ** cfg["sel_weight_pwr"]


def _predict_pm(cfg, model, params, params_r2, A, te_vec, r2_model=None,
                train=True):
    """G_A2B (+ G_A2R2) forward → PM row (nb, 1, H, W, [FM, R2*]),
    upcast to f32 (bf16 CNNs feed f32 physics)."""
    g = cfg["G_model"]
    out = model.apply({"params": params}, A, te_vec,
                      train=train).astype(jnp.float32)
    if g in ("PM-Gen", "VET-Net", "multi-decod"):
        return out  # already (nb, 1, H, W, [FM, R2*])
    if g == "U-Net":
        fm = out[..., :1]
        r2 = (out[..., 1:] + 1.0) * 0.5
        return jnp.concatenate([fm, r2], axis=-1)
    if g == "2U-Net":
        fm = out  # (nb, 1, H, W, 1) tanh
        a_abs = jnp.sqrt(jnp.sum(jnp.square(A), axis=-1, keepdims=True))
        r2 = r2_model.apply({"params": params_r2}, a_abs, te_vec,
                            train=False).astype(jnp.float32)
        return jnp.concatenate([fm, r2], axis=-1)
    raise NameError(g)


def make_loss_fn(cfg, model, r2_model=None, tv_scale: float = 1.0):
    """TEaug generator loss (reference train_G, train-IDEAL-TEaug.py:
    237-360) as a standalone `loss_fn(params, params_r2, B, te, key)`.

    `tv_scale` multiplies the batch-SUM terms (TV regularizers) so the
    microbatched step's chunk-averaged loss/grads equal the full-batch
    quantities exactly (common.accumulate_microbatch_grads)."""
    g_model = cfg["G_model"]
    out_vars = cfg["out_vars"]

    def loss_fn(params, params_r2, B, te, key):
        # Synthesize acquisitions from GT maps at the sampled TEs + noise.
        A = synthesize_fused(B[:, :3], te, cfg["field"])
        A = A + cfg["noise_std"] * jax.random.normal(key, A.shape)
        te_vec = te[..., 0]

        B_pm = B[:, 2:3]
        B_wf_abs = jnp.sqrt(jnp.sum(jnp.square(B[:, :2]), axis=-1,
                                    keepdims=True))

        if out_vars == "WF":
            # Direct magnitude regression (train-IDEAL-TEaug.py:237-253).
            # ME-UNet output is species-last (nb, 1, H, W, 2); GT rows are
            # species-on-axis-1 (nb, 2, H, W, 1) — transpose before the
            # mask/MAE or broadcasting silently cross-compares species.
            wf_abs = model.apply({"params": params}, A,
                                 te_vec).astype(jnp.float32)
            wf_abs = jnp.transpose(wf_abs, (0, 4, 2, 3, 1))
            # Support mask on the complex MAGNITUDE of the GT rows — a
            # voxel with near-zero real part but nonzero imaginary part
            # (phase ≈ ±90°) is inside the support and must not be zeroed
            # against its nonzero |W|/|F| target.
            wf_abs = jnp.where(B_wf_abs != 0.0, wf_abs, 0.0)
            sup = jnp.mean(jnp.abs(B_wf_abs - wf_abs))
            return sup, {"PM_loss": sup, "WF_loss": sup,
                         "TV_R2": jnp.asarray(0.0),
                         "TV_FM": jnp.asarray(0.0), "G_loss": sup}

        if g_model == "MDWF-Net":
            # Joint [WF mags, R2*, FM] regression (the reference's WF-PM
            # branch, train-IDEAL-TEaug.py:314-340, implemented). MDWF
            # consumes the legacy channel-interleaved layout
            # (reference feeds it via data.A_from_MEBCRN).
            from ..data.layouts import acqs_from_mebcrn
            out = model.apply({"params": params}, acqs_from_mebcrn(A),
                              te_vec).astype(jnp.float32)
            out = out[:, None] if out.ndim == 4 else out
            wf_abs = jnp.transpose(out[..., :2], (0, 4, 2, 3, 1))
            pm = jnp.stack([out[..., 3], out[..., 2]], axis=-1)  # [FM, R2]
            wf_mae = jnp.mean(jnp.abs(B_wf_abs - wf_abs))
            pm_mae = jnp.mean(jnp.abs(B_pm - pm))
            sup = wf_mae + pm_mae
            r2 = pm[..., 1:]
            fm = pm[..., :1]
        else:
            pm = _predict_pm(cfg, model, params, params_r2, A, te_vec,
                             r2_model)
            # Support mask to the GT PM rows (train-IDEAL-TEaug.py:295,
            # the non-DL_gen path) — applied before the loss AND the TV
            # regularizers, as the reference masks B2A2B_PM itself.
            pm = jnp.where(B_pm != 0.0, pm, 0.0)
            if cfg["sel_weight"]:
                sel_w = _selective_weight(cfg, B, A, te)
                sel_w = jnp.concatenate([sel_w, sel_w], axis=-1)
            else:
                sel_w = 1.0
            sup = jnp.mean(jnp.abs(sel_w * B_pm - sel_w * pm))
            fm = pm[..., :1]
            r2 = pm[..., 1:]
            # B→A→B̂ map consistency through the physics fit (diagnostic).
            wf_hat = physics.fit_rho(A, pm, te, field=cfg["field"])
            wf_abs = jnp.sqrt(jnp.sum(jnp.square(wf_hat), axis=-1,
                                      keepdims=True))
            wf_mae = jnp.mean(jnp.abs(B_wf_abs - wf_abs))

        r2_tv = (jnp.sum(total_variation_2d(r2[:, 0]))
                 * cfg["R2_TV_weight"] * tv_scale)
        fm_tv = (jnp.sum(total_variation_2d(fm[:, 0]))
                 * cfg["FM_TV_weight"] * tv_scale)
        loss = sup + r2_tv + fm_tv
        return loss, {"PM_loss": sup, "WF_loss": wf_mae, "TV_R2": r2_tv,
                      "TV_FM": fm_tv, "G_loss": loss}
    return loss_fn


def make_train_step(cfg, model, r2_model=None):
    loss_fn = make_loss_fn(cfg, model, r2_model)
    micro = int(cfg.get("microbatch", 0) or 0)

    total_steps = cfg.get("total_steps", cfg["epochs"])
    schedule = linear_decay_schedule(
        cfg["lr"], total_steps,
        int(cfg["epoch_decay"] * total_steps / max(cfg["epochs"], 1)))
    tx = make_adam(schedule, cfg["beta_1"], cfg["beta_2"])

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: TEAugState, batch, key):
        B, te = batch
        if micro:
            # Gradient accumulation over batch chunks (scan body backward
            # is a batch-`micro` plan — compiles where the monolithic f32
            # 384²·b8 backward crashes the XLA compiler, docs/DESIGN.md).
            n_chunks = B.shape[0] // micro
            lf = make_loss_fn(cfg, model, r2_model,
                              tv_scale=float(n_chunks))
            grad_fn = lambda p, chunk, k: jax.value_and_grad(
                lf, has_aux=True)(p, state.params_r2, *chunk, k)
            (loss, metrics), grads = accumulate_microbatch_grads(
                grad_fn, state.params, (B, te), key, micro)
        else:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.params_r2, B, te,
                                       key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(params=params, opt_state=opt_state,
                              step=state.step + 1), metrics

    return train_step, tx


def make_r2_train_step(cfg, model, r2_model, tx):
    """2U-Net second phase: train G_A2R2 with the FM net frozen (reference
    train_G_R2, train-IDEAL-TEaug.py:364-420)."""

    def loss_fn(params_r2, params, B, te, key):
        A = synthesize_fused(B[:, :3], te, cfg["field"])
        A = A + cfg["noise_std"] * jax.random.normal(key, A.shape)
        te_vec = te[..., 0]
        a_abs = jnp.sqrt(jnp.sum(jnp.square(A), axis=-1, keepdims=True))

        fm = jax.lax.stop_gradient(
            model.apply({"params": params}, A, te_vec,
                        train=False)).astype(jnp.float32)
        r2 = r2_model.apply({"params": params_r2}, a_abs,
                            te_vec).astype(jnp.float32)
        pm = jnp.concatenate([fm, r2], axis=-1)
        pm = jnp.where(B[:, 2:3] != 0.0, pm, 0.0)

        r2_loss = jnp.mean(jnp.abs(B[:, 2:3, :, :, 1:] - pm[..., 1:]))
        r2_tv = (jnp.sum(total_variation_2d(pm[:, 0, :, :, 1:]))
                 * cfg["R2_TV_weight"])
        # diagnostic WF loss through the fit (reference :398-408)
        wf_hat = physics.fit_rho(A, pm, te, field=cfg["field"])
        wf_abs = jnp.sqrt(jnp.sum(jnp.square(wf_hat), axis=-1,
                                  keepdims=True))
        b_wf_abs = jnp.sqrt(jnp.sum(jnp.square(B[:, :2]), axis=-1,
                                    keepdims=True))
        wf_mae = jnp.mean(jnp.abs(b_wf_abs - wf_abs))
        total = r2_loss + r2_tv
        return total, {"R2_loss": r2_loss, "TV_R2_aux": r2_tv,
                       "WF_loss_aux": wf_mae}

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: TEAugState, batch, key):
        B, te = batch
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params_r2, state.params, B, te,
                                   key)
        updates, opt_r2 = tx.update(grads, state.opt_r2, state.params_r2)
        params_r2 = optax.apply_updates(state.params_r2, updates)
        return state._replace(params_r2=params_r2, opt_r2=opt_r2), metrics

    return train_step


def init_state(cfg, model, tx, key, h=192, w=192, r2_model=None):
    ne = cfg["n_echoes"]
    te = physics.te_train(ne, bs=1)
    acqs = jnp.zeros((1, ne, h, w, 2), jnp.float32)
    if cfg["G_model"] == "MDWF-Net":
        from ..data.layouts import acqs_from_mebcrn
        params = model.init(key, acqs_from_mebcrn(acqs),
                            te[..., 0])["params"]
    else:
        params = model.init(key, acqs, te[..., 0])["params"]
    params_r2 = None
    opt_r2 = None
    if r2_model is not None:
        a_abs = jnp.zeros((1, ne, h, w, 1), jnp.float32)
        params_r2 = r2_model.init(key, a_abs, te[..., 0])["params"]
        opt_r2 = tx.init(params_r2)
    return TEAugState(params, tx.init(params), jnp.zeros((), jnp.int32),
                      params_r2, opt_r2)
