"""Latent diffusion on frozen PI-VAE latents (rebuild of train-ldm.py) and
dataset generation (gen_LDM_dataset.py).

Train: encode each batch with the frozen PI-VAE encoder, normalize by the
precomputed global latent std z_std (two-pass scan over the dataset,
train-ldm.py:277-296), add noise at a sampled timestep, and train the
denoising U-Net on the ε-prediction MSE — with optional steatosis-grade
class conditioning.

Sample: the reverse DDPM/DDIM chain runs as a lax.scan (one compiled
program — the reference drove 200 sequential UNet calls from python,
gen_LDM_dataset.py:141-148), then VQ → decoders → physics forward to emit
synthetic acquisitions + maps.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import physics
from .. import diffusion as dm
from ..models import DenoiseUNet
from .common import linear_decay_schedule, make_adam
from .gan import decode_maps

DEFAULTS = dict(
    experiment_dir="output/WF-IDEAL", n_timesteps=200, n_ldm_filters=64,
    batch_size=8, epochs=400, epoch_ckpt=20, lr=0.0001, beta_1=0.9,
    beta_2=0.999, scheduler="linear", class_cond=False, n_classes=4,
    in_res=16, dim_mults=(1, 2, 4), infer_steps=200, infer_sigma=0.0,
)


class LDMState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def build_model(cfg, channels: int):
    return DenoiseUNet(dim=cfg["n_ldm_filters"],
                       dim_mults=tuple(cfg["dim_mults"]), channels=channels,
                       num_classes=cfg["n_classes"] if cfg["class_cond"]
                       else None,
                       in_res=cfg["in_res"])


def build_schedule(cfg) -> dm.DiffusionSchedule:
    if cfg["scheduler"] == "cosine":
        return dm.cosine_beta_schedule(cfg["n_timesteps"])
    return dm.linear_beta_schedule(cfg["n_timesteps"])


def latent_std(encode_fn, batches) -> float:
    """Global latent std over the dataset (train-ldm.py:277-296) in ONE
    streaming pass: a single jitted encode→(Σz, Σz²) kernel per batch,
    accumulated host-side in f64, with Var = E[z²] − E[z]². Algebraically
    equal to the reference's two-pass mean-then-variance but encodes the
    dataset once instead of twice (the pre-pass is the one full-dataset
    host loop in LDM training). The checkpointed z_std scalar semantics
    are unchanged."""
    def _stats(a):
        z = encode_fn(a)
        return jnp.sum(z), jnp.sum(jnp.square(z)), jnp.asarray(z.size)

    stats = jax.jit(_stats)
    count = 0
    sum_acc = 0.0
    sq_acc = 0.0
    for a in batches:
        s, ss, n = stats(jnp.asarray(a))
        sum_acc += float(s)
        sq_acc += float(ss)
        count += int(n)
    mean = sum_acc / count
    return float(np.sqrt(max(sq_acc / count - mean * mean, 0.0)))


def make_train_step(cfg, model, sched: dm.DiffusionSchedule, encode_fn):
    """encode_fn(A) -> frozen-encoder latent (deterministic point
    estimate)."""

    def loss_fn(params, z_n, t, noise, labels):
        eps_hat = model.apply({"params": params}, z_n, t, labels)
        return jnp.mean(jnp.square(noise - eps_hat))

    schedule = linear_decay_schedule(cfg["lr"], cfg["epochs"], cfg["epochs"])
    tx = make_adam(schedule, cfg["beta_1"], cfg["beta_2"])

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: LDMState, batch, key):
        z, labels = batch
        k1, k2 = jax.random.split(key)
        t = dm.sample_timesteps(k1, z.shape[0], sched.timesteps)
        z_noisy, noise = dm.forward_noise(k2, z, t, sched)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, z_noisy, t, noise, labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (LDMState(params, opt_state, state.step + 1),
                {"loss": loss, "G_loss": loss})

    return train_step, tx


def init_state(cfg, model, tx, key, latent_shape):
    z = jnp.zeros(latent_shape, jnp.float32)
    t = jnp.zeros((latent_shape[0],), jnp.int32)
    labels = jnp.zeros((latent_shape[0],), jnp.int32)
    params = model.init(key, z, t, labels)["params"]
    return LDMState(params, tx.init(params), jnp.zeros((), jnp.int32))


def sample_latents(cfg, model, params, sched, key, n: int, latent_hw,
                   channels: int, z_std: float, labels=None,
                   method: str = "ddpm"):
    """Reverse-diffusion sampling of PI-VAE latents as one lax.scan
    program."""
    if labels is None:
        labels = jnp.zeros((n,), jnp.int32)

    def denoise_fn(x, t):
        return model.apply({"params": params}, x, t, labels)

    shape = (n, latent_hw[0], latent_hw[1], channels)
    if method == "ddim":
        z = dm.ddim_sample(key, denoise_fn, shape, sched,
                           n_steps=cfg["infer_steps"],
                           sigma=cfg["infer_sigma"])
    else:
        z = dm.ddpm_sample(key, denoise_fn, shape, sched)
    return z * z_std


def generate_dataset(cfg, gan_cfg, models, params_g, ldm_model, ldm_params,
                     sched, key, n_samples: int, latent_hw, z_std: float,
                     ne: int = 6, method: str = "ddpm"):
    """Sampled latents → (VQ) → decoders → physics forward: synthetic
    (acqs, maps) pairs for --DL_gen downstream training
    (gen_LDM_dataset.py:133-158)."""
    from ..models import VectorQuantizer
    k1, k2 = jax.random.split(key)
    z = sample_latents(cfg, ldm_model, ldm_params, sched, k1, n_samples,
                       latent_hw, gan_cfg["encoded_size"], z_std,
                       method=method)
    if gan_cfg["VQ_encoder"]:
        vq = VectorQuantizer(embedding_dim=gan_cfg["encoded_size"],
                             num_embeddings=gan_cfg["VQ_num_embed"],
                             commitment_cost=gan_cfg["VQ_commit_cost"])
        z, _ = vq.apply({"params": params_g["vq"]}, z,
                        mutable=["losses", "metrics"])
    maps = decode_maps(gan_cfg, models, params_g, z, train=False)
    te = physics.te_train(ne, bs=n_samples)
    acqs = physics.synthesize_mag(maps, te)
    return acqs, maps
