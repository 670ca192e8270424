"""Magnitude-only R2*/PDFF training with Rician likelihood (rebuild of
train-IDEAL-mag.py).

A UNet on |S| predicts R2* — as a Rician posterior when main_loss='Rice' —
and the magnitude-domain LS fit (`cse_mag_fit`) recovers (|W|, |F|) and the
reconstructed magnitude signal. Supervised mode synthesizes A from GT maps
at random TEs on-device; unsupervised mode uses the magnitude cycle loss.
Extra regularizers from the reference: demodulated-signal TV, LS
non-negativity, PDFF<50 % prior, and the quadratic-discriminant condition
(train-IDEAL-mag.py:305-316).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import functools

import jax
import jax.numpy as jnp
import optax

from .. import physics
from ..losses import total_variation_2d
from ..models import UNet
from ..prob import Rician
from .common import linear_decay_schedule, make_adam

DEFAULTS = dict(
    dataset="Mag-300", n_echoes=6, field=1.5, training_mode="supervised",
    main_loss="MSE",  # Rice | MSE | MAE | MSLE
    main_out_var="R2s",  # R2s | WF | R2s-WF
    n_G_filters=36, batch_size=8, epochs=100, epoch_decay=100, epoch_ckpt=10,
    lr=0.0002, beta_1=0.9, beta_2=0.9999, R2_TV_weight=0.0,
    A_demod_TV_weight=0.0, LS_NZ_weight=0.0, LS_cond_weight=0.0,
    D1_SelfAttention=True, bf16=False, remat=False,
)


class MagState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def build_model(cfg):
    """With bf16=True the CNN computes in bfloat16 (params stay f32; the
    Rician head and physics fit are upcast to f32 — SURVEY §7 rule)."""
    dtype = jnp.bfloat16 if cfg.get("bf16") else jnp.float32
    return UNet(n_out=1, bayesian=(cfg["main_loss"] == "Rice"),
                me_layer=True, te_input=(cfg["training_mode"] == "supervised"),
                remat=cfg.get("remat", False),
                filters=cfg["n_G_filters"], output_activation="sigmoid",
                self_attention=cfg["D1_SelfAttention"], dtype=dtype)


def _point_losses(name):
    if name in ("MSE", "Rice"):
        return lambda a, b: jnp.mean(jnp.square(a - b))
    if name == "MAE":
        return lambda a, b: jnp.mean(jnp.abs(a - b))
    if name == "MSLE":
        return lambda a, b: jnp.mean(jnp.square(
            jnp.log1p(jnp.maximum(a, 0)) - jnp.log1p(jnp.maximum(b, 0))))
    raise NameError(f"Unrecognized Main Loss Function {name!r}")


def make_loss_fn(cfg, model):
    """The mag train-G loss (reference train-IDEAL-mag.py:255-316) as a
    standalone `loss_fn(params, B, te, key)` — shared by the train step
    and tools/model_parity.py."""
    rice = cfg["main_loss"] == "Rice"
    supervised = cfg["training_mode"] == "supervised"
    loss_alt = _point_losses(cfg["main_loss"])

    def loss_fn(params, B, te, key):
        k1, k2 = jax.random.split(key)
        # Synthesize complex acquisitions from GT maps, take magnitudes.
        A = physics.synthesize(B[:, :3], te, field=cfg["field"])
        a_mag = jnp.sqrt(jnp.sum(jnp.square(A), axis=-1, keepdims=True))
        a_msk = jnp.mean(a_mag, axis=1, keepdims=True)
        a_msk_me = jnp.repeat(a_msk, A.shape[1], axis=1)

        if supervised:
            out = model.apply({"params": params}, a_mag, te[..., 0],
                              rngs={"bayes": k1})
        else:
            out = model.apply({"params": params}, a_mag, rngs={"bayes": k1})
        if isinstance(out, Rician):
            out = Rician(nu=out.nu.astype(jnp.float32),
                         sigma=out.sigma.astype(jnp.float32))
        else:
            out = out.astype(jnp.float32)

        if rice:
            assert isinstance(out, Rician)
            r2_nu, r2_point = out.nu, out.mean()
            r2s_nu_maps = r2_nu
        else:
            r2_point = jnp.where(a_msk >= 5e-2, out, 0.0)
            r2_nu = r2_point
            r2s_nu_maps = None

        res = physics.cse_mag_fit(a_mag, r2_point, te, field=cfg["field"],
                                  r2s_nu=r2s_nu_maps)
        a2b2a = jnp.where(a_msk_me >= 5e-2, res.recon, 0.0)
        cycle_loss = loss_alt(a_mag, a2b2a)

        # Split losses vs GT maps.
        b_wf_abs = jnp.sqrt(jnp.sum(jnp.square(B[:, :2]), axis=-1,
                                    keepdims=True))
        b_wf_sq = jnp.concatenate([
            jnp.square(b_wf_abs[:, :1]),
            2.0 * jnp.prod(b_wf_abs, axis=1, keepdims=True),
            jnp.square(b_wf_abs[:, 1:])], axis=1)
        wf_loss = loss_alt(b_wf_sq, res.ls_coeffs)
        b_r2 = B[:, 2:3, ..., 1:]
        if rice:
            r2_loss = -jnp.mean(out.log_prob(b_r2))
        else:
            r2_loss = loss_alt(b_r2, r2_point)

        r2_tv = jnp.sum(total_variation_2d(r2_nu[:, 0]))

        if supervised:
            if cfg["main_out_var"] == "R2s":
                g_loss = r2_loss
            elif cfg["main_out_var"] == "WF":
                g_loss = wf_loss
            else:
                g_loss = r2_loss + wf_loss
        else:
            g_loss = cycle_loss
        g_loss = g_loss + r2_tv * cfg["R2_TV_weight"]

        # Extra physics regularizers (train-IDEAL-mag.py:305-316).
        ad = res.demod.reshape((-1,) + res.demod.shape[2:])
        ad_tv = jnp.sum(total_variation_2d(ad))
        ls = res.ls_coeffs  # (nb, 3, H, W, 1): (a, b, c)
        ls_nz = jnp.sum(jnp.where(ls[:, ::2] < 0.0, jnp.square(ls[:, ::2]),
                                  0.0))
        wf_nz = jnp.sum(jnp.where(ls[:, :1] < ls[:, -1:],
                                  ls[:, -1:] - ls[:, :1], 0.0))
        cond = jnp.square(ls[:, 1:2]) - 4.0 * jnp.prod(ls[:, ::2], axis=1,
                                                       keepdims=True)
        ls_cond = jnp.sum(jnp.where(cond > 0.0, jnp.square(cond), 0.0))
        g_loss = (g_loss + ad_tv * cfg["A_demod_TV_weight"]
                  + ls_nz * cfg["LS_NZ_weight"]
                  + ls_cond * cfg["LS_cond_weight"])

        return g_loss, {"A2B2A_cycle_loss": cycle_loss, "WF_loss": wf_loss,
                        "R2_loss": r2_loss, "R2_TV": r2_tv, "Ad_TV": ad_tv,
                        "LS_NZ": ls_nz, "WF_NZ": wf_nz, "LS_cond": ls_cond,
                        "G_loss": g_loss}

    return loss_fn


def make_train_step(cfg, model):
    loss_fn = make_loss_fn(cfg, model)
    schedule = linear_decay_schedule(cfg["lr"], cfg["epochs"],
                                     cfg["epoch_decay"])
    tx = make_adam(schedule, cfg["beta_1"], cfg["beta_2"])

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: MagState, batch, key):
        B, te = batch
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, B, te, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return MagState(params, opt_state, state.step + 1), metrics

    return train_step, tx


def init_state(cfg, model, tx, key, h=32, w=32):
    ne = cfg["n_echoes"]
    te = physics.te_train(ne, bs=1)
    a_mag = jnp.zeros((1, ne, h, w, 1), jnp.float32)
    rngs = {"params": key, "bayes": key}
    if cfg["training_mode"] == "supervised":
        params = model.init(rngs, a_mag, te[..., 0])["params"]
    else:
        params = model.init(rngs, a_mag)["params"]
    return MagState(params, tx.init(params), jnp.zeros((), jnp.int32))
