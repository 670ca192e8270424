"""SAGAN self-attention and AdaIN conditioning (DLlib/attention.py rebuild).

SelfAttention runs over H·W tokens (≤ 576 at the latent resolutions it is
used at) — a single einsum softmax attention, MXU-friendly. AdaIN follows
the reference's exact statistics: the style moments are computed over the
whole style vector (per-sample scalars), the content moments per-channel
over (H, W) (DLlib/attention.py:73-86).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class SelfAttention(nn.Module):
    """f/g (C/8) and h (C) 1×1 convs, attention softmax(g·fᵀ) over flattened
    spatial tokens, learnable scalar γ initialized to 0, residual output
    (DLlib/attention.py:10-70)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        cf = max(c // 8, 1)
        f = nn.Conv(cf, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.glorot_uniform(), name="f")(x)
        g = nn.Conv(cf, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.glorot_uniform(), name="g")(x)
        hh = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.glorot_uniform(), name="h")(x)
        fm = f.reshape(b, h * w, cf)
        gm = g.reshape(b, h * w, cf)
        hm = hh.reshape(b, h * w, c)
        s = jnp.einsum("bnc,bmc->bnm", gm, fm)  # (b, N, N)
        beta = nn.softmax(s, axis=-1)
        o = jnp.einsum("bnm,bmc->bnc", beta, hm).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * o + x


def adain(content: jnp.ndarray, style: jnp.ndarray, alpha: float = 1.0,
          epsilon: float = 1e-5) -> jnp.ndarray:
    """Adaptive instance normalization, reference semantics: content
    normalized by per-channel (H, W) moments, then scaled/shifted by the
    *scalar* per-sample moments of the style vector
    (DLlib/attention.py:73-86)."""
    style_mean = jnp.mean(style, axis=1, keepdims=True)  # (nb, 1)
    style_var = jnp.var(style, axis=1, keepdims=True)
    style_mean = style_mean[:, None, None, :]
    style_var = style_var[:, None, None, :]
    c_mean = jnp.mean(content, axis=(1, 2), keepdims=True)
    c_var = jnp.var(content, axis=(1, 2), keepdims=True)
    normalized = (content - c_mean) / jnp.sqrt(c_var + epsilon)
    normalized = normalized * jnp.sqrt(style_var) + style_mean
    return alpha * normalized + (1.0 - alpha) * content
