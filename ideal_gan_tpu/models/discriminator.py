"""Discriminators (Flax rebuild of DLlib/module.py:251-338).

PatchGAN uses spectral normalization on every conv (power iteration via
flax.linen.SpectralNorm, updated through the 'batch_stats' collection —
trainers must apply with mutable=['batch_stats'] during training).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .attention import SelfAttention
from .blocks import Norm


class PatchGAN(nn.Module):
    """Spectral-norm conv discriminator with n_downsamplings, optional cGAN
    second input (channel concat), multi-echo folding of the echo axis into
    batch, self-attention before the logit head, 1-channel logit map
    (DLlib/module.py:266-317)."""

    dim: int = 64
    n_downsamplings: int = 3
    in_kernel: int = 4
    n_kernel: int = 4
    cgan: bool = False
    multi_echo: bool = False
    n_groups: int = 1
    self_attention: bool = True
    norm: str = "instance_norm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x2=None, train: bool = True):
        if self.cgan:
            x = jnp.concatenate([x, x2], axis=-1)
        if self.multi_echo and x.ndim == 5:
            x = x.reshape((-1,) + x.shape[2:])

        def sn_conv(features, kernel, strides, use_bias=True, init="he",
                    name=None):
            conv = nn.Conv(
                features, (kernel, kernel), strides=strides, use_bias=use_bias,
                feature_group_count=self.n_groups,
                kernel_init=(nn.initializers.he_normal() if init == "he"
                             else nn.initializers.glorot_normal()),
                dtype=self.dtype)
            return nn.SpectralNorm(conv, collection_name="batch_stats",
                                   name=name)

        dim_ = self.dim
        dim = self.dim
        x = sn_conv(dim, self.in_kernel, 2)(x, update_stats=train)
        x = nn.leaky_relu(x, 0.2)
        for _ in range(self.n_downsamplings - 1):
            dim = min(dim * 2, dim_ * 16)
            x = sn_conv(dim, self.n_kernel, 2, use_bias=False)(
                x, update_stats=train)
            x = Norm(self.norm, dtype=self.dtype)(x, train)
            x = nn.leaky_relu(x, 0.2)
        dim = min(dim * 2, dim_ * 16)
        x = sn_conv(dim, self.n_kernel, 1, use_bias=False)(
            x, update_stats=train)
        x = Norm(self.norm, dtype=self.dtype)(x, train)
        x = nn.leaky_relu(x, 0.2)
        if self.self_attention:
            x = SelfAttention(dtype=self.dtype)(x)
        x = sn_conv(1, self.n_kernel, 1, init="glorot")(x, update_stats=train)
        return x


class CriticZ(nn.Module):
    """Latent critic: n × [optional SA, stride-2 leaky conv] with dim
    divided by 4 each level (DLlib/module.py:251-263)."""

    dim: int = 64
    n_downsamplings: int = 3
    kernel: int = 3
    self_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = self.dim
        for _ in range(self.n_downsamplings):
            if self.self_attention:
                x = SelfAttention(dtype=self.dtype)(x)
            x = nn.Conv(dim, (self.kernel, self.kernel), strides=2,
                        kernel_init=nn.initializers.he_normal(),
                        dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
            dim //= 4
        return x


class SGAN(nn.Module):
    """Feature extractor / residual generator (DLlib/module.py:320-338):
    gen_mode adds a final conv + input residual; otherwise returns the list
    of per-layer features."""

    gen_mode: bool = False
    num_filters: int = 32
    num_layers: int = 5
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        inputs = x
        feats = []
        for _ in range(self.num_layers):
            x = nn.Conv(self.num_filters, (3, 3),
                        kernel_init=nn.initializers.he_normal(),
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        if self.gen_mode:
            x = nn.Conv(inputs.shape[-1], (3, 3), dtype=self.dtype)(x)
            return inputs + x
        return feats
