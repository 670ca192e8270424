"""AI-DEAL unsupervised physics-loss training (rebuild of
train-IDEAL-unsup.py).

The generator predicts a field-map posterior from the complex multi-echo
acquisitions (optionally an R2* posterior from magnitudes via a second
net); the loss is the self-consistency of the IDEAL cycle ‖A − Â‖² with
Â = W⁺MM⁺W⁻A — no ground-truth maps. With uncertainty quantification (UQ)
the cycle loss becomes the heteroscedastic `var_mse` with per-echo
variances propagated through `acq_uncertainty`. A per-echo non-negative
calibration scale rescales σ² (the working rebuild of the reference's
`G_calib` NonNeg 1×1 conv, train-IDEAL-unsup.py:176-178): with
UQ_calib=True, `make_calib_train_step` trains it with SGD on a dedicated
calibration split while both nets stay frozen (reference :94-99,315-317).

The hot op is the fused cycle kernel (rho + recon in one HBM pass);
training runs data-parallel over the mesh.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import functools

import jax
import jax.numpy as jnp
import optax

from .. import physics
from ..ops import cycle_full_fused
from ..losses import l1_mean, total_variation_2d, var_mse
from ..models import UNet
from ..prob import Normal, Rician
from .common import linear_decay_schedule, make_adam

DEFAULTS = dict(
    dataset="Unsup-v0", n_echoes=6, field=1.5, out_vars="FM",  # FM | PM
    UQ=False, UQ_R2s=False, UQ_calib=False, rand_ne=False, remove_ech1=False,
    bf16=False, remat=False,
    data_aug_p=0.4, n_G_filters=36, batch_size=8, epochs=100, epoch_decay=100,
    epoch_ckpt=10, lr=0.0002, beta_1=0.9, beta_2=0.9999, grad_clip=1.0,
    FM_TV_weight=0.0, FM_L1_weight=0.0, R2_TV_weight=0.0, R2_L1_weight=0.0,
    D1_SelfAttention=True, D2_SelfAttention=False, uniform_te=True,
    learn_fm_offset=False, fm_offset_lr=1e-3,
)


class UnsupState(NamedTuple):
    params_fm: Any
    opt_fm: Any
    params_r2: Any
    opt_r2: Any
    calib: Any          # per-echo non-neg σ²-scale, shape (n_echoes,)
    opt_calib: Any      # SGD state (optax.sgd)
    fm_offset: Any      # learnable global FM offset (normalized units)
    step: jnp.ndarray


def build_models(cfg):
    """With bf16=True the CNNs compute in bfloat16 (params stay f32; the
    physics cycle always runs f32/c64 — SURVEY §7 numerics rule)."""
    dtype = jnp.bfloat16 if cfg.get("bf16") else jnp.float32
    g_fm = UNet(n_out=1, bayesian=cfg["UQ"], me_layer=True,
                filters=cfg["n_G_filters"], remat=cfg.get("remat", False),
                self_attention=cfg["D1_SelfAttention"], dtype=dtype)
    g_r2 = UNet(n_out=1, bayesian=cfg["UQ_R2s"], me_layer=True,
                filters=cfg["n_G_filters"], output_activation="sigmoid",
                remat=cfg.get("remat", False),
                self_attention=cfg["D2_SelfAttention"], dtype=dtype)
    return g_fm, g_r2


def _as_mean_sigma(out):
    """Posterior → (mean, σ), upcast to f32 (bf16 CNNs feed f32 physics)."""
    if isinstance(out, (Normal, Rician)):
        if isinstance(out, Normal):
            mean, sigma = out.loc, out.scale
        else:
            mean, sigma = out.nu, out.sigma
        return mean.astype(jnp.float32), sigma.astype(jnp.float32)
    return out.astype(jnp.float32), None


def _calib_scale(calib, ne):
    """Per-echo non-negative σ²-scale, broadcast over (nb, ne, H, W, ch).
    `calib` is the working rebuild of the reference's never-trained
    `G_calib` 1×1 NonNeg conv (train-IDEAL-unsup.py:176-178): one
    non-negative weight per echo (the reference's Conv2D(1,1) collapses to
    a single scalar; per-echo is strictly more expressive), projected to
    ≥0 after every SGD step like keras NonNeg."""
    return calib[:ne][None, :, None, None, None]


def _uq_pipeline(cfg, g_fm, g_r2, params_fm, fm_offset, params_r2, calib,
                 A, te, key, train=True, stop_grad_r2=False,
                 stop_grad_fm=False, stop_grad_wf=False, with_var=True):
    """Shared forward used by the train step, the σ-calibration step and
    the held-out NLL evaluator: posterior heads → fused physics cycle →
    (optionally) propagated per-echo acquisition variance × calibration
    scale.

    Returns (fm_mean, r2_mean, a_hat, a_var); a_hat is already masked
    to the acquisition support; a_var is None when with_var=False."""
    pm_mode = cfg["out_vars"] == "PM"
    k1, k2 = jax.random.split(key)
    out_fm = g_fm.apply({"params": params_fm}, A, rngs={"bayes": k1},
                        train=train)
    fm_mean, fm_sigma = _as_mean_sigma(out_fm)
    if cfg.get("learn_fm_offset"):
        # Instance-normalized CNNs carry no DC channel, so the absolute
        # field-map level is weakly constrained (the water-fat
        # swap/offset ambiguity); a learnable global offset restores it —
        # trained by the same cycle loss.
        fm_mean = fm_mean + fm_offset
    if stop_grad_fm:
        fm_mean = jax.lax.stop_gradient(fm_mean)  # FM net frozen (R2 phase)
    if pm_mode:
        a_abs = jnp.sqrt(jnp.sum(jnp.square(A), axis=-1, keepdims=True))
        out_r2 = g_r2.apply({"params": params_r2}, a_abs,
                            rngs={"bayes": k2}, train=train)
        r2_mean, r2_sigma = _as_mean_sigma(out_r2)
        if stop_grad_r2:
            r2_mean = jax.lax.stop_gradient(r2_mean)  # R2 net trained apart
    else:
        r2_mean, r2_sigma = jnp.zeros_like(fm_mean), None
    pm = jnp.concatenate([fm_mean, r2_mean], axis=-1)
    # uniform_te engages the phasor-recurrence kernel inside jit (traced
    # TE arrays defeat the auto-detection); protocol trains are uniform.
    # fused_physics=False routes through the pure-XLA cycle — used by the
    # benchmark harness to quantify what the fused kernel buys in
    # training (benchmarks/train_step_time.py; docs/DESIGN.md).
    if cfg.get("fused_physics", True):
        wf, a_hat = cycle_full_fused(A, pm, te, cfg["field"],
                                     uniform_te=cfg.get("uniform_te",
                                                        False))
    else:
        wf, a_hat = physics.cycle_full(A, pm, te, cfg["field"])
    a_hat = jnp.where(A != 0.0, a_hat, 0.0)
    if not with_var:
        return fm_mean, r2_mean, a_hat, None
    phi = physics.Posterior(
        fm_mean[:, 0, ..., 0],
        jnp.square(fm_sigma[:, 0, ..., 0]) if fm_sigma is not None
        else jnp.zeros_like(fm_mean[:, 0, ..., 0]))
    r2s = physics.Posterior(
        r2_mean[:, 0, ..., 0],
        jnp.square(r2_sigma[:, 0, ..., 0]) if r2_sigma is not None
        else jnp.zeros_like(r2_mean[:, 0, ..., 0]))
    wf_in = jax.lax.stop_gradient(wf) if stop_grad_wf else wf
    a_var = physics.acq_uncertainty(wf_in, phi, r2s, te, field=cfg["field"],
                                    rem_r2=not pm_mode)
    a_var = a_var * _calib_scale(calib, a_var.shape[1])
    return fm_mean, r2_mean, a_hat, a_var


def make_loss_fn(cfg, g_fm, g_r2):
    """The unsupervised cycle loss (reference train_G,
    train-IDEAL-unsup.py:196-265) as a standalone
    `loss_fn(params_fm, fm_offset, params_r2, calib, A, te, key)` —
    shared by the train step and tools/model_parity.py."""
    uq = cfg["UQ"]

    def loss_fn(params_fm, fm_offset, params_r2, calib, A, te, key):
        fm_mean, _, a_hat, a_var = _uq_pipeline(
            cfg, g_fm, g_r2, params_fm, fm_offset, params_r2, calib,
            A, te, key, stop_grad_r2=True, stop_grad_wf=True, with_var=uq)
        if uq:
            cycle_loss = var_mse(A, jnp.concatenate([a_hat, a_var], axis=-1))
        else:
            cycle_loss = jnp.mean(jnp.square(A - a_hat))

        fm_tv = jnp.sum(total_variation_2d(fm_mean[:, 0])) * cfg["FM_TV_weight"]
        fm_l1 = l1_mean(fm_mean) * cfg["FM_L1_weight"]
        loss = cycle_loss + fm_tv + fm_l1
        metrics = {"A2B2A_cycle_loss": cycle_loss, "TV_FM": fm_tv,
                   "L1_FM": fm_l1, "G_loss": loss}
        return loss, metrics

    return loss_fn


def make_train_step(cfg, g_fm, g_r2):
    loss_fn = make_loss_fn(cfg, g_fm, g_r2)
    total_steps = cfg.get("total_steps", cfg["epochs"])
    schedule = linear_decay_schedule(
        cfg["lr"], total_steps,
        int(cfg["epoch_decay"] * total_steps / max(cfg["epochs"], 1)))
    tx = make_adam(schedule, cfg["beta_1"], cfg["beta_2"],
                   clip_norm=cfg["grad_clip"])

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: UnsupState, batch, key):
        A, te = batch
        (loss, metrics), (grads, g_off) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.params_fm, state.fm_offset, state.params_r2,
                state.calib, A, te, key)
        updates, opt_fm = tx.update(grads, state.opt_fm, state.params_fm)
        params_fm = optax.apply_updates(state.params_fm, updates)
        fm_offset = state.fm_offset - cfg["fm_offset_lr"] * g_off
        return state._replace(params_fm=params_fm, opt_fm=opt_fm,
                              fm_offset=fm_offset,
                              step=state.step + 1), metrics

    return train_step, tx


def make_r2_train_step(cfg, g_fm, g_r2, tx):
    """Second phase: train the R2* net with the FM net frozen (reference
    train_G_R2, train-IDEAL-unsup.py:267-331)."""

    def loss_fn(params_r2, params_fm, fm_offset, A, te, key):
        # PM-mode forward with the FM net frozen; no variance needed
        r2_cfg = cfg if cfg["out_vars"] == "PM" else dict(cfg,
                                                          out_vars="PM")
        _, r2_mean, a_hat, _ = _uq_pipeline(
            r2_cfg, g_fm, g_r2, params_fm, fm_offset, params_r2, None,
            A, te, key, stop_grad_fm=True, with_var=False)
        loss = jnp.mean(jnp.square(A - a_hat))
        r2_tv = jnp.sum(total_variation_2d(r2_mean[:, 0])) * cfg["R2_TV_weight"]
        r2_l1 = l1_mean(r2_mean) * cfg["R2_L1_weight"]
        total = loss + r2_tv + r2_l1
        return total, {"R2_cycle_loss": loss, "TV_R2": r2_tv, "L1_R2": r2_l1}

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: UnsupState, batch, key):
        A, te = batch
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params_r2, state.params_fm,
                                   state.fm_offset, A, te, key)
        updates, opt_r2 = tx.update(grads, state.opt_r2, state.params_r2)
        params_r2 = optax.apply_updates(state.params_r2, updates)
        return state._replace(params_r2=params_r2, opt_r2=opt_r2,
                              step=state.step + 1), metrics

    return train_step


def make_calib_tx(cfg):
    """Plain SGD for the calibration weights (reference
    train-IDEAL-unsup.py:189: tf.keras.optimizers.SGD(args.lr))."""
    return optax.sgd(cfg["lr"])


def make_calib_train_step(cfg, g_fm, g_r2):
    """σ-calibration stage (reference train-IDEAL-unsup.py:272,315-317,
    run with UQ_calib=True on the calibration split, :94-99): both nets
    frozen and deterministic, the heteroscedastic cycle loss is minimized
    over the per-echo calibration scale only; the weight is projected to
    ≥0 after each SGD step (keras NonNeg constraint semantics)."""
    tx_calib = make_calib_tx(cfg)

    def loss_fn(calib, params_fm, fm_offset, params_r2, A, te, key):
        _, _, a_hat, a_var = _uq_pipeline(
            cfg, g_fm, g_r2, params_fm, fm_offset, params_r2, calib,
            A, te, key, train=False)
        loss = var_mse(A, jnp.concatenate([a_hat, a_var], axis=-1))
        return loss, {"calib_loss": loss}

    @functools.partial(jax.jit, donate_argnums=0)
    def calib_step(state: UnsupState, batch, key):
        A, te = batch
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.calib, state.params_fm,
                                   state.fm_offset, state.params_r2,
                                   A, te, key)
        updates, opt_calib = tx_calib.update(grads, state.opt_calib,
                                             state.calib)
        calib = jnp.maximum(optax.apply_updates(state.calib, updates), 0.0)
        return state._replace(calib=calib, opt_calib=opt_calib,
                              step=state.step + 1), metrics

    return calib_step


def eval_calibrated_nll(cfg, g_fm, g_r2):
    """Held-out heteroscedastic NLL at a given calibration — the
    calibration-quality metric used by tests and the CLI report."""

    @jax.jit
    def nll(state: UnsupState, A, te, key):
        _, _, a_hat, a_var = _uq_pipeline(
            cfg, g_fm, g_r2, state.params_fm, state.fm_offset,
            state.params_r2, state.calib, A, te, key, train=False)
        return var_mse(A, jnp.concatenate([a_hat, a_var], axis=-1))

    return nll


def init_state(cfg, g_fm, g_r2, tx, key, sample_A):
    k1, k2 = jax.random.split(key)
    A = jnp.asarray(sample_A)
    a_abs = jnp.sqrt(jnp.sum(jnp.square(A), axis=-1, keepdims=True))
    params_fm = g_fm.init({"params": k1, "bayes": k1}, A)["params"]
    params_r2 = g_r2.init({"params": k2, "bayes": k2}, a_abs)["params"]
    calib = jnp.ones((cfg["n_echoes"],), jnp.float32)
    return UnsupState(params_fm, tx.init(params_fm),
                      params_r2, tx.init(params_r2),
                      calib, make_calib_tx(cfg).init(calib),
                      jnp.zeros((), jnp.float32),
                      jnp.zeros((), jnp.int32))
