"""Diffusion β schedules (reference train-ldm.py:176-187)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    beta: jnp.ndarray        # (T,)
    alpha: jnp.ndarray       # (T,)
    alpha_bar: jnp.ndarray   # (T,)

    @property
    def timesteps(self) -> int:
        return self.beta.shape[0]


def _from_beta(beta: np.ndarray) -> DiffusionSchedule:
    alpha = 1.0 - beta
    alpha_bar = np.cumprod(alpha)
    return DiffusionSchedule(jnp.asarray(beta, jnp.float32),
                             jnp.asarray(alpha, jnp.float32),
                             jnp.asarray(alpha_bar, jnp.float32))


def linear_beta_schedule(timesteps: int, beta_start: float = 1e-4,
                         beta_end: float = 0.02) -> DiffusionSchedule:
    return _from_beta(np.linspace(beta_start, beta_end, timesteps,
                                  dtype=np.float64))


def cosine_beta_schedule(timesteps: int, s: float = 0.008,
                         max_beta: float = 0.999) -> DiffusionSchedule:
    t = np.arange(timesteps + 1, dtype=np.float64) / timesteps
    f = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
    alpha_bar = f / f[0]
    beta = np.clip(1.0 - alpha_bar[1:] / alpha_bar[:-1], 0.0, max_beta)
    return _from_beta(beta)
