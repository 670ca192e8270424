"""Spatial regularizers: total variation and L1 (as used throughout the
reference trainers, e.g. train-IDEAL-unsup.py:249-251)."""

from __future__ import annotations

import jax.numpy as jnp


def total_variation_2d(img: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic TV summed per image for NHWC tensors, matching
    tf.image.total_variation: Σ|∂x| + Σ|∂y| per batch element."""
    dh = jnp.abs(img[:, 1:, :, :] - img[:, :-1, :, :])
    dw = jnp.abs(img[:, :, 1:, :] - img[:, :, :-1, :])
    axes = (1, 2, 3)
    return jnp.sum(dh, axis=axes) + jnp.sum(dw, axis=axes)


def total_variation(maps: jnp.ndarray) -> jnp.ndarray:
    """Σ over the batch of per-image TV; accepts (nb, H, W, C) or MEBCRN
    rows (nb, 1, H, W, C) (reference usage sums tf.image.total_variation
    over a map row)."""
    if maps.ndim == 5:
        maps = maps[:, 0]
    return jnp.sum(total_variation_2d(maps))


def l1_mean(maps: jnp.ndarray) -> jnp.ndarray:
    """Σ over batch of mean |x| per element (reference FM_L1 pattern:
    reduce_sum(reduce_mean(abs(x), axis=(1,2,3,4))))."""
    axes = tuple(range(1, maps.ndim))
    return jnp.sum(jnp.mean(jnp.abs(maps), axis=axes))
