"""Latent-diffusion denoising U-Net (Flax rebuild of DLlib/ldm_module.py +
DLlib/utils.py).

Structure per resolution: class-conditioning plane concat → 2 × ResnetBlock
with time-FiLM (γ, β) → residual pre-norm LinearAttention → down/upsample;
mid block with full softmax attention. Sinusoidal time embedding → MLP.

Divergence from the reference, documented: the reference's `Attention`
subtracts the stop-gradient arg-max *index* from the logits
(DLlib/utils.py:223-226), which is a bug in its max-stabilization; we
subtract the max *value* (the standard stable softmax).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int,
                       max_positions: int = 10000) -> jnp.ndarray:
    half = dim // 2
    emb = math.log(max_positions) / (half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class _LayerNorm(nn.Module):
    """Channel layer-norm with (1,1,1,C) affine (DLlib/utils.py:71-84)."""

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1, 1, 1, x.shape[-1]))
        b = self.param("b", nn.initializers.zeros, (1, 1, 1, x.shape[-1]))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + 1e-5) * g + b


class _Block(nn.Module):
    dim: int
    groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, gamma_beta=None):
        x = nn.Conv(self.dim, (3, 3), dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype)(x)
        if gamma_beta is not None:
            gamma, beta = gamma_beta
            x = x * (gamma + 1.0) + beta
        return nn.silu(x)


class ResnetBlock(nn.Module):
    dim_out: int
    time_emb: bool = True
    groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t=None):
        gamma_beta = None
        if self.time_emb and t is not None:
            te = nn.Dense(self.dim_out * 2, dtype=self.dtype)(nn.silu(t))
            te = te[:, None, None, :]
            gamma_beta = jnp.split(te, 2, axis=-1)
        h = _Block(self.dim_out, self.groups, self.dtype)(x, gamma_beta)
        h = _Block(self.dim_out, self.groups, self.dtype)(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype)(x)
        return h + x


class LinearAttention(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False,
                      dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, h * w, self.heads, self.dim_head).transpose(
                0, 2, 3, 1)  # (b, heads, d, n)

        q, k, v = map(heads, (q, k, v))
        q = nn.softmax(q, axis=-2) * (self.dim_head ** -0.5)
        k = nn.softmax(k, axis=-1)
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype)(out)
        return _LayerNorm()(out)


class Attention(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False,
                      dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, h * w, self.heads, self.dim_head).transpose(
                0, 2, 1, 3)  # (b, heads, n, d)

        q, k, v = map(heads, (q, k, v))
        sim = jnp.einsum("bhid,bhjd->bhij", q * (self.dim_head ** -0.5), k)
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        attn = nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, hidden)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype)(out)


class ClassConditioning(nn.Module):
    """Label embedding → Dense(res²) → one extra conditioning plane
    (DLlib/utils.py:253-264)."""

    res: int
    num_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, emb):
        y = nn.Dense(self.res * self.res * self.num_channels,
                     dtype=self.dtype)(emb)
        y = nn.silu(y)
        return y.reshape(-1, self.res, self.res, self.num_channels)


class DenoiseUNet(nn.Module):
    """ε-prediction U-Net over the PI-VAE latent grid
    (DLlib/ldm_module.py:10-136)."""

    dim: int = 64
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    resnet_block_groups: int = 8
    num_classes: Optional[int] = None
    class_emb_dim: int = 64
    in_res: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time, class_vector=None):
        init_dim = self.init_dim or (self.dim // 3 * 2)
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))

        if self.num_classes is not None:
            emb = nn.Embed(self.num_classes, self.class_emb_dim,
                           dtype=self.dtype)(class_vector)
            if emb.ndim == 3:  # (b, 1, d) from integer labels with axis
                emb = emb[:, 0]
        else:
            emb = jnp.zeros((x.shape[0], self.class_emb_dim), self.dtype)

        x = nn.Conv(init_dim, (7, 7), dtype=self.dtype)(x)
        t = sinusoidal_pos_emb(time, self.dim)
        t = nn.Dense(self.dim * 4, dtype=self.dtype)(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(self.dim * 4, dtype=self.dtype)(t)

        num_res = len(in_out)
        now_res = self.in_res
        hs = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            cv = ClassConditioning(now_res, dtype=self.dtype)(emb)
            x = jnp.concatenate([x, cv], axis=-1)
            x = ResnetBlock(dim_out, groups=self.resnet_block_groups,
                            dtype=self.dtype)(x, t)
            x = ResnetBlock(dim_out, groups=self.resnet_block_groups,
                            dtype=self.dtype)(x, t)
            x = x + LinearAttention(dim_out, dtype=self.dtype)(
                _LayerNorm()(x))
            hs.append(x)
            if not is_last:
                x = nn.Conv(dim_out, (4, 4), strides=2, dtype=self.dtype)(x)
                now_res //= 2

        mid_dim = dims[-1]
        cv = ClassConditioning(now_res, dtype=self.dtype)(emb)
        x = jnp.concatenate([x, cv], axis=-1)
        x = ResnetBlock(mid_dim, groups=self.resnet_block_groups,
                        dtype=self.dtype)(x, t)
        x = x + Attention(mid_dim, dtype=self.dtype)(_LayerNorm()(x))
        x = ResnetBlock(mid_dim, groups=self.resnet_block_groups,
                        dtype=self.dtype)(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            is_last = ind >= num_res - 1
            cv = ClassConditioning(now_res, dtype=self.dtype)(emb)
            x = jnp.concatenate([x, cv], axis=-1)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock(dim_in, groups=self.resnet_block_groups,
                            dtype=self.dtype)(x, t)
            x = ResnetBlock(dim_in, groups=self.resnet_block_groups,
                            dtype=self.dtype)(x, t)
            x = x + LinearAttention(dim_in, dtype=self.dtype)(
                _LayerNorm()(x))
            if not is_last:
                x = nn.ConvTranspose(dim_in, (4, 4), strides=(2, 2),
                                     dtype=self.dtype)(x)
                now_res *= 2

        x = jnp.concatenate([x, hs.pop()], axis=-1)
        x = ResnetBlock(self.dim, groups=self.resnet_block_groups,
                        dtype=self.dtype)(x)
        out_dim = self.out_dim or self.channels
        return nn.Conv(out_dim, (1, 1), dtype=self.dtype)(x)
