"""PI-VAE generative training with optional WGAN adversary (rebuild of
train-IDEAL-GAN.py).

Encoder → latent (Gaussian posterior with KL, or VQ) → split 3 → ff/mag/pha
decoders → mag/phase maps → physics forward (`synthesize_mag`) → recon
echoes. Losses: VGG-perceptual or pixel cycle on A, map cycle on B (phase
rows weighted), latent covariance-whitening, KL/VQ regularizers, and WGAN
generator/discriminator losses with R1 penalty + replay pool.

Divergences (documented): the covariance-whitening target is eye(D) over
the latent dimension (the reference compares against tf.eye(1) —
train-IDEAL-GAN.py:277/286 — an apparent indexing bug); VGG features use a
fixed-seed random-init VGG19 unless local pretrained weights are supplied
(zero-egress environment).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import functools

import jax
import jax.numpy as jnp
import optax

from .. import physics
from ..eval.metrics import (covariance_map, echoes_to_vgg_input, init_vgg19,
                            perceptual_cosine_loss)
from ..losses import adversarial_losses, r1_regularization
from ..models import Decoder, Encoder, PatchGAN, VectorQuantizer
from ..prob import Normal
from .common import linear_decay_schedule, make_adam

DEFAULTS = dict(
    dataset="WF-IDEAL", data_size=192, rand_ne=False, rand_ph_offset=False,
    unwrap=True, n_G_filters=36, n_G_filt_list="", n_downsamplings=4,
    n_res_blocks=2,
    # NOTE: the reference defaults encoded_size=256, which its own
    # tf.split(z, 3) crashes on (train-IDEAL-GAN.py:31,234); per SURVEY
    # §7.9 policy this is fixed: default 258 = 3·86 and validated at
    # build time.
    encoded_size=258, VQ_encoder=False, VQ_num_embed=64, VQ_commit_cost=0.5,
    adv_train=False, cGAN=False, n_D_filters=72, batch_size=1, epochs=100,
    epoch_decay=100, epoch_ckpt=20, lr=0.0002, D_lr_factor=1, beta_1=0.5,
    beta_2=0.9, critic_train_steps=1, R1_reg_weight=0.2, main_loss="MSE",
    A_loss="VGG", A_loss_weight=0.01, B_loss_weight=0.1, FM_loss_weight=1.0,
    ls_reg_weight=1e-7, cov_reg_weight=0.0, Fourier_reg_weight=0.0,
    NL_SelfAttention=True, pool_size=50, bf16=False,
)


class GANState(NamedTuple):
    params_g: Any    # {'enc','dec_ff','dec_mag','dec_pha','vq'}
    opt_g: Any
    params_d: Any
    d_stats: Any     # spectral-norm power-iteration state
    opt_d: Any
    step: jnp.ndarray


def parse_filt_list(cfg):
    """--n_G_filt_list: comma-separated per-level encoder widths; decoder
    widths are the list divided by the decoder-count factors (reference
    train-IDEAL-GAN.py:67-68,138-145). Returns (nfe, nfd, nfd2) where each
    is an int or a per-level tuple."""
    nd = 3
    raw = cfg.get("n_G_filt_list", "")
    if isinstance(raw, str) and raw:
        filt_list = [int(a) for a in raw.split(",")]
    elif isinstance(raw, (list, tuple)) and raw:
        filt_list = [int(a) for a in raw]
    else:
        filt_list = []
    if len(filt_list) == cfg["n_downsamplings"] + 1:
        return (tuple(filt_list),
                tuple(a // nd for a in filt_list),
                tuple(a // (nd + 1) for a in filt_list))
    if filt_list:
        raise ValueError(
            f"--n_G_filt_list needs n_downsamplings+1="
            f"{cfg['n_downsamplings'] + 1} entries, got {len(filt_list)}")
    return (cfg["n_G_filters"], cfg["n_G_filters"] // nd,
            cfg["n_G_filters"] // (nd + 1))


def build_models(cfg):
    """With bf16=True the encoder and the three decoders compute in
    bfloat16 (params stay f32; the latent posterior/VQ, discriminator and
    physics synthesis run f32 — spectral-norm power iteration and the KL
    term are precision-sensitive)."""
    if cfg["encoded_size"] % 3 != 0:
        raise ValueError(
            f"encoded_size must be divisible by 3 (the latent splits into "
            f"ff/mag/pha decoder thirds), got {cfg['encoded_size']}. The "
            f"reference shares this constraint but defaults to an invalid "
            f"256 (train-IDEAL-GAN.py:31,234); use e.g. "
            f"{cfg['encoded_size'] + (3 - cfg['encoded_size'] % 3)}.")
    nfe, nfd, nfd2 = parse_filt_list(cfg)
    dtype = jnp.bfloat16 if cfg.get("bf16") else jnp.float32
    enc = Encoder(encoded_dims=cfg["encoded_size"],
                  filters=nfe,
                  num_layers=cfg["n_downsamplings"],
                  num_res_blocks=cfg["n_res_blocks"],
                  sd_out=not cfg["VQ_encoder"], ls_mean_activ="None",
                  nl_self_attention=cfg["NL_SelfAttention"], dtype=dtype)
    common = dict(num_layers=cfg["n_downsamplings"],
                  num_res_blocks=cfg["n_res_blocks"],
                  nl_self_attention=cfg["NL_SelfAttention"], dtype=dtype)
    dec_ff = Decoder(encoded_dims=cfg["encoded_size"] // 3, n_out=1,
                     filters=nfd2,
                     output_activation="sigmoid", **common)
    dec_mag = Decoder(encoded_dims=cfg["encoded_size"] // 3, n_out=2,
                      filters=nfd,
                      output_activation="relu", **common)
    dec_pha = Decoder(encoded_dims=cfg["encoded_size"] // 3, n_out=2,
                      filters=nfd,
                      output_activation="none", **common)
    disc = PatchGAN(dim=cfg["n_D_filters"], cgan=cfg["cGAN"],
                    multi_echo=True,
                    self_attention=cfg["NL_SelfAttention"])
    vq = VectorQuantizer(embedding_dim=cfg["encoded_size"],
                         num_embeddings=cfg["VQ_num_embed"],
                         commitment_cost=cfg["VQ_commit_cost"])
    return enc, dec_ff, dec_mag, dec_pha, disc, vq


def _cgan_pair(a_even_src, a_odd_src):
    """cGAN echo pairing (train-IDEAL-GAN.py:249-256,300-309): even echoes
    of the reference signal condition the odd echoes under judgment."""
    a_ref = a_even_src[:, 0::2]
    a_x = a_odd_src[:, 1::2]
    if a_x.shape[1] < a_ref.shape[1]:
        a_ref = a_ref[:, :-1]
    return a_ref, a_x


def _point_loss(name):
    if name == "MSE":
        return lambda a, b: jnp.mean(jnp.square(a - b))
    if name == "MAE":
        return lambda a, b: jnp.mean(jnp.abs(a - b))
    if name == "MSLE":
        return lambda a, b: jnp.mean(jnp.square(
            jnp.log1p(jnp.maximum(a, 0)) - jnp.log1p(jnp.maximum(b, 0))))
    raise NameError(f"Unrecognized Main Loss Function {name!r}")


def decode_maps(cfg, models, params_g, z, train=True):
    """latent → mag/phase map rows [(FF,0),(mag...),(pha...)]."""
    _, dec_ff, dec_mag, dec_pha, _, _ = models
    z_ff, z_mag, z_pha = jnp.split(z, 3, axis=-1)
    b_ff = dec_ff.apply({"params": params_g["dec_ff"]}, z_ff,
                        train).astype(jnp.float32)
    b_mag = dec_mag.apply({"params": params_g["dec_mag"]}, z_mag,
                          train).astype(jnp.float32)
    b_pha = dec_pha.apply({"params": params_g["dec_pha"]}, z_pha,
                          train).astype(jnp.float32)
    b_ff = jnp.concatenate([b_ff, jnp.zeros_like(b_ff)], axis=-1)
    return jnp.concatenate([b_ff, b_mag, b_pha], axis=1)  # (nb,3,H,W,2)


def make_train_steps(cfg, models, vgg=None):
    enc, dec_ff, dec_mag, dec_pha, disc, vq = models
    cycle_loss = _point_loss(cfg["main_loss"])
    d_loss_fn, g_loss_fn = adversarial_losses("wgan")
    if cfg["A_loss"] == "VGG" and vgg is None:
        vgg = init_vgg19()

    def encode(params_g, A, key, train=True):
        out = enc.apply({"params": params_g["enc"]}, A, train)
        # upcast the bf16 encoder's latent so posterior/KL/VQ stay f32
        if isinstance(out, Normal):
            out = Normal(loc=out.loc.astype(jnp.float32),
                         scale=out.scale.astype(jnp.float32))
        else:
            out = out.astype(jnp.float32)
        vq_loss = jnp.asarray(0.0)
        perplexity = jnp.asarray(0.0)
        kl = jnp.asarray(0.0)
        if cfg["VQ_encoder"]:
            z, aux = vq.apply({"params": params_g["vq"]}, out,
                              mutable=["losses", "metrics"])
            vq_loss = jax.tree_util.tree_leaves(aux["losses"])[-1]
            perplexity = jax.tree_util.tree_leaves(aux["metrics"])[-1]
        else:
            z = out.sample(key)
            kl = jnp.mean(out.kl_to_std_normal())
        return z, vq_loss, kl, perplexity

    def g_loss_fn_full(params_g, params_d, d_stats, A, B, te, key):
        z, vq_loss, kl, perplexity = encode(params_g, A, key)
        a2b = decode_maps(cfg, models, params_g, z)
        a2b2a = physics.synthesize_mag(a2b, te)

        if cfg["adv_train"]:
            if cfg["cGAN"]:
                # condition odd (generated) echoes on even (reference) ones
                # (train-IDEAL-GAN.py:249-256 pairing)
                a_ref, a_g = _cgan_pair(A, a2b2a)
                logits = disc.apply(
                    {"params": params_d, "batch_stats": d_stats}, a_g,
                    a_ref, train=False)
            else:
                logits = disc.apply(
                    {"params": params_d, "batch_stats": d_stats}, a2b2a,
                    train=False)
            g_adv = g_loss_fn(logits)
        else:
            g_adv = jnp.asarray(0.0)

        if cfg["A_loss"] == "VGG":
            vgg_model, vgg_vars = vgg
            fa = vgg_model.apply(vgg_vars, echoes_to_vgg_input(A))
            fb = vgg_model.apply(vgg_vars, echoes_to_vgg_input(a2b2a))
            a_cycle = perceptual_cosine_loss(fa, fb)
        else:
            a_cycle = cycle_loss(A, a2b2a)

        b_cycle = cycle_loss(B[:, :2], a2b[:, :2])
        b_cycle += cycle_loss(B[:, 2:], a2b[:, 2:]) * cfg["FM_loss_weight"]

        # Fourier-domain cycle regularizer (reference F_op + msle,
        # train-IDEAL-GAN.py:242-246,275; default weight 0.0)
        if cfg["Fourier_reg_weight"] > 0.0:
            from ..models import fourier_layer
            a_f = fourier_layer(A)
            a2b2a_f = fourier_layer(a2b2a)
            f_cycle = jnp.mean(jnp.square(
                jnp.log1p(jnp.abs(a_f)) - jnp.log1p(jnp.abs(a2b2a_f))))
        else:
            f_cycle = jnp.asarray(0.0)

        # The D×D latent covariance is only materialized when the
        # whitening regularizer is active (the reference computes it
        # unconditionally, train-IDEAL-GAN.py:228, which is O(D²) memory).
        if cfg["cov_reg_weight"] > 0.0:
            z_cov = covariance_map(z)
            d_lat = z_cov.shape[-1]
            cov_loss = jnp.mean(jnp.square(z_cov - jnp.eye(d_lat)))
        else:
            cov_loss = jnp.asarray(0.0)

        g_loss = (cfg["A_loss_weight"] * a_cycle
                  + cfg["B_loss_weight"] * b_cycle + g_adv
                  + kl * cfg["ls_reg_weight"]
                  + vq_loss * cfg["ls_reg_weight"]
                  + cov_loss * cfg["cov_reg_weight"]
                  + f_cycle * cfg["Fourier_reg_weight"])
        metrics = {"A2B2A_g_loss": g_adv, "A2B2A_cycle_loss": a_cycle,
                   "B2A2B_cycle_loss": b_cycle,
                   "A2B2A_f_cycle_loss": f_cycle, "LS_reg": kl,
                   "Cov_reg": cov_loss, "VQ_loss": vq_loss,
                   "VQ_perplexity": perplexity, "G_loss": g_loss}
        return g_loss, (metrics, a2b2a)

    total_steps = cfg.get("total_steps", cfg["epochs"])
    g_sched = linear_decay_schedule(
        cfg["lr"], total_steps,
        int(cfg["epoch_decay"] * total_steps / max(cfg["epochs"], 1)))
    tx_g = make_adam(g_sched, cfg["beta_1"], cfg["beta_2"])
    d_total = total_steps * cfg["critic_train_steps"]
    d_sched = linear_decay_schedule(
        cfg["lr"] * cfg["D_lr_factor"], d_total,
        int(cfg["epoch_decay"] * d_total / max(cfg["epochs"], 1)))
    tx_d = make_adam(d_sched, cfg["beta_1"], cfg["beta_2"])

    @functools.partial(jax.jit, donate_argnums=0)
    def g_step(state: GANState, batch, key):
        A, B, te = batch
        (loss, (metrics, a2b2a)), grads = jax.value_and_grad(
            g_loss_fn_full, has_aux=True)(state.params_g, state.params_d,
                                          state.d_stats, A, B, te, key)
        updates, opt_g = tx_g.update(grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates)
        return (state._replace(params_g=params_g, opt_g=opt_g,
                               step=state.step + 1), metrics, a2b2a)

    def d_loss_fn_full(params_d, d_stats, A, fake):
        if cfg["cGAN"]:
            a_ref, a_r = _cgan_pair(A, A)
            _, a_f = _cgan_pair(A, fake)
            real_logits, mut = disc.apply(
                {"params": params_d, "batch_stats": d_stats}, a_r, a_ref,
                train=True, mutable=["batch_stats"])
            fake_logits, mut = disc.apply(
                {"params": params_d, "batch_stats": mut["batch_stats"]},
                a_f, a_ref, train=True, mutable=["batch_stats"])

            def critic(x):
                return disc.apply(
                    {"params": params_d, "batch_stats": d_stats}, x, a_ref,
                    train=False)

            r1_input = a_r
        else:
            real_logits, mut = disc.apply(
                {"params": params_d, "batch_stats": d_stats}, A,
                train=True, mutable=["batch_stats"])
            fake_logits, mut = disc.apply(
                {"params": params_d, "batch_stats": mut["batch_stats"]},
                fake, train=True, mutable=["batch_stats"])

            def critic(x):
                return disc.apply(
                    {"params": params_d, "batch_stats": d_stats}, x,
                    train=False)

            r1_input = A
        a_d_loss, f_d_loss = d_loss_fn(real_logits, fake_logits)
        r1 = r1_regularization(critic, r1_input)
        d_loss = a_d_loss + f_d_loss + r1 * cfg["R1_reg_weight"]
        return d_loss, ({"D_loss": a_d_loss + f_d_loss, "A_d_loss": a_d_loss,
                         "A2B2A_d_loss": f_d_loss, "D_A_r1": r1},
                        mut["batch_stats"])

    @functools.partial(jax.jit, donate_argnums=0)
    def d_step(state: GANState, A, fake):
        (loss, (metrics, d_stats)), grads = jax.value_and_grad(
            d_loss_fn_full, has_aux=True)(state.params_d, state.d_stats, A,
                                          fake)
        updates, opt_d = tx_d.update(grads, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates)
        return state._replace(params_d=params_d, d_stats=d_stats,
                              opt_d=opt_d), metrics

    return g_step, d_step, (tx_g, tx_d)


def init_state(cfg, models, txs, key, sample_A):
    enc, dec_ff, dec_mag, dec_pha, disc, vq = models
    tx_g, tx_d = txs
    A = jnp.asarray(sample_A)
    k1, k2, k3 = jax.random.split(key, 3)
    enc_vars = enc.init(k1, A)
    latent_shape = (A.shape[0], A.shape[2] // 2 ** cfg["n_downsamplings"],
                    A.shape[3] // 2 ** cfg["n_downsamplings"],
                    cfg["encoded_size"])
    z0 = jnp.zeros(latent_shape, jnp.float32)
    z_split = jnp.split(z0, 3, axis=-1)
    params_g = {
        "enc": enc_vars["params"],
        "dec_ff": dec_ff.init(k2, z_split[0])["params"],
        "dec_mag": dec_mag.init(k2, z_split[1])["params"],
        "dec_pha": dec_pha.init(k2, z_split[2])["params"],
        "vq": vq.init(k3, z0)["params"],
    }
    if cfg["cGAN"]:
        a_ref, a_x = _cgan_pair(A, A)
        d_vars = disc.init(k3, a_x, a_ref)
    else:
        d_vars = disc.init(k3, A)
    params_d = d_vars["params"]
    d_stats = d_vars.get("batch_stats", {})
    return GANState(params_g, tx_g.init(params_g), params_d, d_stats,
                    tx_d.init(params_d), jnp.zeros((), jnp.int32))
