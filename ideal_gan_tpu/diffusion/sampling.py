"""Diffusion forward noising and reverse samplers.

Rebuild of DMlib/diff_ops.py with explicit jax.random keys, and — the key
TPU change — the reverse loops as `lax.scan` over the denoiser so the whole
T-step chain compiles to one XLA program instead of the reference's
host-driven python loop (gen_LDM_dataset.py:141-148, SURVEY §3.5).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule


def forward_noise(key: jax.Array, x0: jnp.ndarray, t: jnp.ndarray,
                  sched: DiffusionSchedule):
    """x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε (DMlib/diff_ops.py:9-17). t: (nb,) int."""
    noise = jax.random.normal(key, x0.shape, x0.dtype)
    shape = (-1,) + (1,) * (x0.ndim - 1)
    sab = jnp.sqrt(sched.alpha_bar[t]).reshape(shape)
    somab = jnp.sqrt(1.0 - sched.alpha_bar[t]).reshape(shape)
    return sab * x0 + somab * noise, noise


def sample_timesteps(key: jax.Array, num: int, timesteps: int) -> jnp.ndarray:
    """Uniform timestep draw (DMlib/diff_ops.py:19-21)."""
    return jax.random.randint(key, (num,), 0, timesteps)


def ddpm_reverse_step(key: jax.Array, x_t: jnp.ndarray,
                      pred_noise: jnp.ndarray, t: jnp.ndarray,
                      sched: DiffusionSchedule) -> jnp.ndarray:
    """One DDPM posterior step (DMlib/diff_ops.py:25-35)."""
    alpha_t = sched.alpha[t]
    alpha_bar_t = sched.alpha_bar[t]
    eps_coef = (1.0 - alpha_t) / jnp.sqrt(1.0 - alpha_bar_t)
    mean = (x_t - eps_coef * pred_noise) / jnp.sqrt(alpha_t)
    var = sched.beta[t]
    z = jax.random.normal(key, x_t.shape, x_t.dtype)
    return mean + jnp.sqrt(var) * z


def ddim_reverse_step(key: jax.Array, x_t: jnp.ndarray,
                      pred_noise: jnp.ndarray, t: jnp.ndarray,
                      sigma_t: float, sched: DiffusionSchedule) -> jnp.ndarray:
    """One DDIM step (DMlib/diff_ops.py:50-61); reproduces the reference's
    use of α (not ᾱ) at t−1."""
    alpha_bar_t = sched.alpha_bar[t]
    alpha_tm1 = sched.alpha[jnp.maximum(t - 1, 0)]
    pred_x0 = (x_t - jnp.sqrt(1.0 - alpha_bar_t) * pred_noise) / jnp.sqrt(
        alpha_bar_t)
    pred = jnp.sqrt(alpha_tm1) * pred_x0
    pred = pred + jnp.sqrt(jnp.maximum(1.0 - alpha_tm1 - sigma_t ** 2, 0.0)
                           ) * pred_noise
    eps = jax.random.normal(key, x_t.shape, x_t.dtype)
    return pred + sigma_t * eps


def ddpm_sample(key: jax.Array, denoise_fn: Callable, shape,
                sched: DiffusionSchedule) -> jnp.ndarray:
    """Full DDPM reverse chain as a lax.scan: denoise_fn(x, t)->ε̂; runs all
    T UNet calls inside one compiled program."""
    k0, kloop = jax.random.split(key)
    x_init = jax.random.normal(k0, shape)

    def body(x, inp):
        t, k = inp
        t_b = jnp.full((shape[0],), t, jnp.int32)
        eps = denoise_fn(x, t_b)
        x = ddpm_reverse_step(k, x, eps, t, sched)
        return x, None

    ts = jnp.arange(sched.timesteps - 1, -1, -1)
    keys = jax.random.split(kloop, sched.timesteps)
    x, _ = jax.lax.scan(body, x_init, (ts, keys))
    return x


def ddim_sample(key: jax.Array, denoise_fn: Callable, shape,
                sched: DiffusionSchedule, n_steps: int,
                sigma: float = 0.0) -> jnp.ndarray:
    """Strided DDIM reverse chain as a lax.scan
    (gen_LDM_dataset.py:135-148 path)."""
    k0, kloop = jax.random.split(key)
    x_init = jax.random.normal(k0, shape)
    stride = sched.timesteps // n_steps
    ts = jnp.arange(sched.timesteps - 1, -1, -stride)[:n_steps]

    def body(x, inp):
        t, k = inp
        t_b = jnp.full((shape[0],), t, jnp.int32)
        eps = denoise_fn(x, t_b)
        x = ddim_reverse_step(k, x, eps, t, sigma, sched)
        return x, None

    keys = jax.random.split(kloop, len(ts))
    x, _ = jax.lax.scan(body, x_init, (ts, keys))
    return x
