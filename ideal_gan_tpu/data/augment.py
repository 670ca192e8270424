"""Data augmentation as pure functions with explicit PRNG keys.

Rebuild of the host-side augmentations scattered through the reference
trainers (train-IDEAL-TEaug.py:574-606, train-IDEAL-unsup.py:483-503,
train-IDEAL-GAN.py:452-467): geometric rot90/flips applied identically to
every map/echo row, off-resonance field-map scaling, synthetic
bipolar-gradient phase rows, random echo-count truncation, and global phase
offsets. All jnp, jittable where shapes stay static (echo truncation
changes shape and is host-side by nature, as in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def random_geometric(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Random 90° rotation (k ∈ {0,1,2}) + horizontal/vertical flips over
    the spatial axes of a MEBCRN tensor (nb, k, H, W, c), square images.
    Matches the reference aug block (rot90 k∈{0,1,2}, then 50 % flips)."""
    k_rot, k_lr, k_ud = jax.random.split(key, 3)
    k = jax.random.randint(k_rot, (), 0, 3)
    x = jax.lax.switch(k, [
        lambda v: v,
        lambda v: jnp.rot90(v, 1, axes=(2, 3)),
        lambda v: jnp.rot90(v, 2, axes=(2, 3)),
    ], x)
    x = jnp.where(jax.random.bernoulli(k_lr), jnp.flip(x, axis=3), x)
    x = jnp.where(jax.random.bernoulli(k_ud), jnp.flip(x, axis=2), x)
    return x


def random_fm_scale(key: jax.Array, maps: jnp.ndarray, mean: float = 1.0,
                    stddev: float = 0.25) -> jnp.ndarray:
    """Scale the field-map channel (last row, channel 0 in MEBCRN maps) by
    a random N(mean, stddev) factor (train-IDEAL-TEaug.py:592-594 applies it
    to the last channel of the legacy layout; here: row 2 channel 0)."""
    scale = mean + stddev * jax.random.normal(key, ())
    fm = maps[:, 2:3, ..., 0:1] * scale
    row2 = jnp.concatenate([fm, maps[:, 2:3, ..., 1:]], axis=-1)
    return jnp.concatenate([maps[:, :2], row2, maps[:, 3:]], axis=1)


def bipolar_phase_row(key: jax.Array, maps: jnp.ndarray) -> jnp.ndarray:
    """Append a synthetic bipolar-gradient phase row: a horizontal linear
    ramp masked by nonzero field map (train-IDEAL-TEaug.py:596-606)."""
    nb, _, hgt, wdt, _ = maps.shape
    k1, k2 = jax.random.split(key)
    x_lim = jax.random.uniform(k1, (), minval=0.1, maxval=0.5)
    x_off = jax.random.uniform(k2, (), minval=0.0, maxval=0.01)
    x = jnp.linspace(-1.0, 1.0, wdt) * x_lim + x_off
    ramp = jnp.broadcast_to(x[None, :], (hgt, wdt))
    fm = maps[:, 2:3, ..., 0:1]
    bp = jnp.where(fm != 0.0, ramp[None, None, :, :, None], 0.0)
    row = jnp.concatenate([bp, jnp.zeros_like(bp)], axis=-1)
    return jnp.concatenate([maps, row], axis=1)


def random_echo_count(rng: np.random.Generator, lo: int = 3, hi: int = 7) -> int:
    """Host-side random echo count (shape-changing; reference
    train-IDEAL-unsup.py:499-503)."""
    return int(rng.integers(lo, hi))


def random_phase_offset(key: jax.Array, acqs: jnp.ndarray,
                        maps: jnp.ndarray, unwrapped: bool = False):
    """Apply a global phase offset to the acquisitions and the mag/phase
    map rows (train-IDEAL-GAN.py:455-467). maps are the
    [(FF,·),(PD,R2*),(pha,FM)]-style rows with phase at row 1+, channel 1
    in the reference's indexing: B[:,1:,:,:,1:2]."""
    off = jax.random.uniform(key, (), minval=-np.pi / 2, maxval=np.pi / 2)
    mag = jnp.sqrt(jnp.sum(jnp.square(acqs), axis=-1, keepdims=True))
    pha = jnp.arctan2(acqs[..., 1:], acqs[..., :1])
    acqs = jnp.concatenate(
        [mag * jnp.cos(pha + off), mag * jnp.sin(pha + off)], axis=-1)
    b_pha = maps[:, 1:, :, :, 1:2] + off / np.pi
    if not unwrapped:
        b_pha = jnp.where(b_pha < -np.pi, b_pha + 2 * np.pi, b_pha)
        b_pha = jnp.where(b_pha > np.pi, b_pha - 2 * np.pi, b_pha)
    out_pha = jnp.concatenate([b_pha, b_pha, maps[:, 1:, :, :, 2:]], axis=-1)
    maps = jnp.concatenate([maps[:, :1], out_pha], axis=1)
    return acqs, maps


def gaussian_noise(key: jax.Array, x: jnp.ndarray, stddev: float) -> jnp.ndarray:
    """Additive input noise (reference GaussianNoise layer usage,
    train-IDEAL-TEaug.py:217-218)."""
    return x + stddev * jax.random.normal(key, x.shape, x.dtype)
