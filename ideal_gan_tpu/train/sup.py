"""Supervised water–fat training (rebuild of train-sup.py).

Trains a generator on (acquisitions A, maps B) pairs with MAE supervision
in one of four output modes (train-sup.py:239-358):
  WF    — |W|,|F| magnitudes (sigmoid heads)
  WFc   — complex W/F (4 channels)
  PM    — (R2*, field-map); W/F recovered by the physics LS fit
  WF-PM — both
Variable-TE resynthesis: when the batch TE differs from the default
protocol, A is re-synthesized from B through the forward physics op
(train-sup.py:241-242) — training data is generated on-device.

All modes run under data parallelism: the train step is jitted with batch
inputs sharded over the mesh's 'data' axis; XLA inserts the gradient
all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import physics
from ..data import layouts
from ..losses import l1_mean, total_variation_2d
from ..models import MDWFNet, UNet, VETNet
from .common import (accumulate_microbatch_grads,
                     linear_decay_schedule, make_adam)

DEFAULTS = dict(
    dataset="WF-sup", data_size=192, DL_gen=False, DL_partial_real=0,
    DL_filename="LDM_ds", sigma_noise=0.0, shuffle=True, n_echoes=6,
    TE1=0.0013, dTE=0.0021, field=1.5, out_vars="WF", G_model="multi-decod",
    n_G_filters=72, batch_size=8, epochs=100, epoch_decay=100, epoch_ckpt=10,
    lr=0.0005, beta_1=0.9, beta_2=0.9999, R2_TV_weight=0.0, FM_TV_weight=0.0,
    R2_L1_weight=0.0, FM_L1_weight=0.0, D1_SelfAttention=False,
    D2_SelfAttention=True, D3_SelfAttention=True, bf16=False, remat=False,
    microbatch=0,
)


class SupState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def build_model(cfg):
    """Generator selection (train-sup.py:169-226). The reference's 'MEBCRN'
    branch calls a function that does not exist (dl.MEBCRN,
    train-sup.py:217) — we reject it with a clear error instead.

    With bf16=True the CNN computes in bfloat16 (params stay f32; the
    physics ops always run f32 — SURVEY §7 numerics rule)."""
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if cfg.get("bf16") else jnp.float32
    if cfg["G_model"] == "multi-decod":
        if cfg["out_vars"] == "WF-PM":
            return MDWFNet(filters=cfg["n_G_filters"],
                           remat=cfg.get("remat", False),
                           wf_self_attention=cfg["D1_SelfAttention"],
                           r2_self_attention=cfg["D2_SelfAttention"],
                           fm_self_attention=cfg["D3_SelfAttention"],
                           dtype=dtype)
        if cfg["out_vars"] == "WFc":
            # the reference also cannot run this combination: train_G's
            # WFc branch slices 4 channels from PM_Generator's 2-channel
            # output (train-sup.py:272-275 vs :183-187) — reject with a
            # clear error instead of a broadcast failure
            raise NameError("out_vars='WFc' requires G_model='U-Net' "
                            "(the reference's multi-decod generator has "
                            "2 output channels; its WFc branch crashes)")
        # every other out_vars: the reference builds the 2-decoder
        # PM_Generator (ME_layer=False), NOT the 3-decoder MDWF —
        # train-sup.py:176-187 (D1→R2 attention, D2→FM attention).
        # Reference quirk kept: with out_vars='WF' (the reference
        # DEFAULT) train_G trains these (R2*, FM) heads directly against
        # |W|,|F| targets (train-sup.py:253-257) — degenerate, but it is
        # what the reference runs; meaningful multi-decod configs are
        # out_vars='PM' / 'WF-PM'.
        return VETNet(me_layer=False, te_input=False, n_out=1,
                      filters=cfg["n_G_filters"],
                      remat=cfg.get("remat", False),
                      r2_self_attention=cfg["D1_SelfAttention"],
                      fm_self_attention=cfg["D2_SelfAttention"],
                      dtype=dtype)
    if cfg["G_model"] == "U-Net":
        # head activations exactly as the reference (train-sup.py:193-204):
        # WFc → 4ch tanh, WF-PM → 4ch relu, WF/PM → 2ch relu (the
        # reference shifts GT FM to [0, 1] to match the relu range)
        if cfg["out_vars"] == "WFc":
            n_out, out_activ = 4, "tanh"
        elif cfg["out_vars"] == "WF-PM":
            n_out, out_activ = 4, "relu"
        else:
            n_out, out_activ = 2, "relu"
        return UNet(n_out=n_out, filters=cfg["n_G_filters"],
                    remat=cfg.get("remat", False),
                    output_activation=out_activ,
                    self_attention=cfg["D1_SelfAttention"], dtype=dtype)
    raise NameError(
        f"Unrecognized generator {cfg['G_model']!r} (note: the reference's "
        "'MEBCRN' option is dead code — dl.MEBCRN does not exist)")


def make_loss_fn(cfg, model, tv_scale: float = 1.0):
    """The supervised loss (reference train_G, train-sup.py:239-361) as a
    standalone `loss_fn(params, A, B, te, key) -> (loss, metrics)` —
    shared by the train step and the trainer-parity harness
    (tools/model_parity.py).

    `tv_scale` multiplies the batch-SUM terms (the TV and L1_mean
    regularizers — Σ over batch of per-item reductions) so a microbatched
    step can average chunk losses/grads and recover the full-batch
    quantities exactly: mean terms decompose over equal chunks as-is, sum
    terms need the chunk count folded in
    (common.accumulate_microbatch_grads)."""
    out_vars = cfg["out_vars"]
    default_te = not (cfg["TE1"] != 0.0013 and cfg["dTE"] != 0.0021)
    unet_like = cfg["G_model"] in ("U-Net", "MEBCRN")

    def loss_fn(params, A, B, te, key):
        # Variable-TE resynthesis from GT maps.
        if not default_te:
            A = physics.synthesize(B, te, field=cfg["field"])
        A_leg = layouts.acqs_from_mebcrn(A)
        # Canonical input is complex-MEBCRN maps; converted to the legacy
        # [Wr,Wi,Fr,Fi,R2*,FM] channels. (Divergence, documented: the
        # reference's train_G applies B_from_MEBCRN(mag_and_phase=True) to
        # data its own loaders produce in other layouts —
        # train-sup.py:69-90 load legacy 4-D while :245 assumes 5-D
        # mag/phase rows — so its default path cannot run as written.)
        B_leg = layouts.maps_from_mebcrn(B)
        if cfg["sigma_noise"] > 0.0:
            A_leg = A_leg + cfg["sigma_noise"] * jax.random.normal(
                key, A_leg.shape)
        B_WF = B_leg[..., :4]
        B_PM = B_leg[..., 4:]
        B_WF_abs = jnp.abs(B_WF[..., 0::2] + 1j * B_WF[..., 1::2])

        out = model.apply({"params": params}, A_leg).astype(jnp.float32)
        metrics = {}
        mae = lambda a, b: jnp.mean(jnp.abs(a - b))

        if out_vars == "WF":
            A2B_WF_abs = jnp.where(B_leg[..., :2] != 0.0, out[..., :2], 0.0)
            A2B_R2 = jnp.zeros_like(A2B_WF_abs[..., :1])
            A2B_FM = jnp.zeros_like(A2B_R2)
            sup_loss = mae(B_WF_abs, A2B_WF_abs)
        elif out_vars == "WFc":
            A2B_WF = jnp.where(B_leg[..., :4] != 0.0, out[..., :4], 0.0)
            A2B_WF_abs = jnp.abs(A2B_WF[..., 0::2] + 1j * A2B_WF[..., 1::2])
            A2B_R2 = jnp.zeros_like(A2B_WF_abs[..., :1])
            A2B_FM = jnp.zeros_like(A2B_R2)
            sup_loss = mae(B_WF, A2B_WF)
        elif out_vars == "PM":
            pm = out[..., -2:] if cfg["G_model"] == "multi-decod" else out
            A2B_PM = jnp.where(B_leg[..., :2] != 0.0, pm, 0.0)
            A2B_R2 = A2B_PM[..., :1]
            A2B_FM = A2B_PM[..., 1:]
            if unet_like:
                A2B_FM = (A2B_FM - 0.5) * 2.0
                A2B_FM = jnp.where(B_leg[..., :1] != 0.0, A2B_FM, 0.0)
                A2B_PM = jnp.concatenate([A2B_R2, A2B_FM], axis=-1)
            # physics LS inversion on the MEBCRN layout
            pm_meb = layouts.maps_to_mebcrn(A2B_PM, mode="PM")
            A2B_WF = physics.fit_rho(A, pm_meb, te, field=cfg["field"])
            wf_c = A2B_WF[..., 0] + 1j * A2B_WF[..., 1]
            A2B_WF_abs = jnp.moveaxis(jnp.abs(wf_c), 1, -1)
            sup_loss = mae(B_PM, A2B_PM)
        elif out_vars == "WF-PM":
            B_abs = jnp.concatenate([B_WF_abs, B_PM], axis=-1)
            A2B_abs = jnp.where(B_leg[..., :4] != 0.0, out, 0.0)
            A2B_WF_abs = A2B_abs[..., :2]
            A2B_R2 = A2B_abs[..., 2:3]
            A2B_FM = A2B_abs[..., 3:]
            if unet_like:
                A2B_FM = (A2B_FM - 0.5) * 2.0
                A2B_FM = jnp.where(B_leg[..., :1] != 0.0, A2B_FM, 0.0)
                A2B_abs = jnp.concatenate([A2B_WF_abs, A2B_R2, A2B_FM], -1)
            sup_loss = mae(B_abs, A2B_abs)
        else:
            raise ValueError(out_vars)

        metrics["sup_loss"] = sup_loss
        metrics["WF_loss"] = mae(B_WF_abs, A2B_WF_abs)
        metrics["R2_loss"] = mae(B_PM[..., :1], A2B_R2)
        metrics["FM_loss"] = mae(B_PM[..., 1:], A2B_FM)

        reg = 0.0
        if out_vars not in ("WF", "WFc"):
            r2_tv = (jnp.sum(total_variation_2d(A2B_R2))
                     * cfg["R2_TV_weight"] * tv_scale)
            fm_tv = (jnp.sum(total_variation_2d(A2B_FM))
                     * cfg["FM_TV_weight"] * tv_scale)
            # l1_mean is also a batch-SUM term (Σ over batch of per-item
            # means, regs.py:27), so it carries tv_scale like the TVs.
            r2_l1 = l1_mean(A2B_R2) * cfg["R2_L1_weight"] * tv_scale
            fm_l1 = l1_mean(A2B_FM) * cfg["FM_L1_weight"] * tv_scale
            reg = r2_tv + fm_tv + r2_l1 + fm_l1
            metrics.update(TV_R2=r2_tv, TV_FM=fm_tv, L1_R2=r2_l1,
                           L1_FM=fm_l1)
        return sup_loss + reg, metrics

    return loss_fn


def make_train_step(cfg, model):
    """Build the jitted train step (reference train_G,
    train-sup.py:239-361)."""
    loss_fn = make_loss_fn(cfg, model)
    total_steps = cfg.get("total_steps", cfg["epochs"])
    schedule = linear_decay_schedule(
        cfg["lr"], total_steps,
        int(cfg["epoch_decay"] * total_steps / max(cfg["epochs"], 1)))
    tx = make_adam(schedule, cfg["beta_1"], cfg["beta_2"])

    micro = int(cfg.get("microbatch", 0) or 0)

    # Donating the state halves the params+opt-state HBM footprint on
    # TPU (old and new trees never coexist); callers must reassign
    # `state = train_step(state, ...)` — all CLIs/benchmarks do. On the
    # CPU test backend donation is a no-op.
    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: SupState, batch, key):
        A, B, te = batch
        if micro:
            # Gradient accumulation over batch chunks: the scan body's
            # backward is a batch-`micro` plan, which compiles where the
            # monolithic f32 384²·b8 backward crashes the XLA compiler
            # (docs/DESIGN.md "f32 compiler crash"). Exact: mean terms
            # average over equal chunks; the TV sums carry tv_scale.
            n_chunks = A.shape[0] // micro
            lf = make_loss_fn(cfg, model, tv_scale=float(n_chunks))
            grad_fn = lambda p, chunk, k: jax.value_and_grad(
                lf, has_aux=True)(p, *chunk, k)
            (loss, metrics), grads = accumulate_microbatch_grads(
                grad_fn, state.params, (A, B, te), key, micro)
        else:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, A, B, te, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["G_loss"] = loss
        return SupState(params, opt_state, state.step + 1), metrics

    return train_step, tx


def make_eval_step(cfg, model):
    """Validation metrics without an optimizer update (and without
    donating the state — the train step consumes its input state, so the
    CLI's val pass must not route the live state through it)."""
    loss_fn = make_loss_fn(cfg, model)

    @jax.jit
    def eval_step(state: SupState, batch, key):
        A, B, te = batch
        loss, metrics = loss_fn(state.params, A, B, te, key)
        metrics["G_loss"] = loss
        return metrics

    return eval_step


def init_state(cfg, model, tx, key, sample_A):
    A_leg = layouts.acqs_from_mebcrn(jnp.asarray(sample_A))
    params = model.init(key, A_leg)["params"]
    return SupState(params, tx.init(params), jnp.zeros((), jnp.int32))
