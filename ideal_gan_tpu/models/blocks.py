"""Shared CNN building blocks (Flax rebuild of DLlib/module.py:141-220).

Conventions: NHWC activations, float32 params (physics-adjacent nets stay
f32; set `dtype=jnp.bfloat16` on blocks for bf16 compute where safe).
Norm order follows the reference exactly: conv → activation → norm.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp


def get_activation(name) -> Callable:
    if callable(name):
        return name
    return {
        "relu": nn.relu,
        # the reference always reaches leaky_relu through
        # tf.nn.leaky_relu, whose default slope is 0.2 (jax's is 0.01)
        "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.2),
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "gelu": nn.gelu,
        "silu": nn.silu,
        "none": lambda x: x,
        None: lambda x: x,
    }[name]


class Norm(nn.Module):
    """Norm selector matching the reference's `_get_norm_layer`
    (none / batch_norm / instance_norm / layer_norm)."""

    kind: str = "instance_norm"
    dtype: Any = jnp.float32
    # keras 3 / tfa use ε=1e-3 for batch/instance/layer norm (flax
    # defaults are 1e-5/1e-6) — matched for reference-weight parity
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "none":
            return x
        if self.kind == "batch_norm":
            return nn.BatchNorm(use_running_average=not train,
                                epsilon=self.epsilon, dtype=self.dtype)(x)
        if self.kind == "instance_norm":
            return nn.GroupNorm(num_groups=None, group_size=1,
                                epsilon=self.epsilon, dtype=self.dtype)(x)
        if self.kind == "layer_norm":
            return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype)(x)
        raise ValueError(f"unknown norm {self.kind!r}")


class ConvBlock(nn.Module):
    """Two 3×3 convs with activation→norm after each, optional spatial
    dropout in between and stride-2 on the second conv
    (DLlib/module.py:162-199)."""

    filters: int
    dropout: float = 0.0
    downsampling: bool = False
    kernel_size: Sequence[int] = (3, 3)
    activation: str = "relu"
    norm: str = "instance_norm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.activation)
        stride = 2 if self.downsampling else 1
        x = nn.Conv(self.filters, self.kernel_size, use_bias=False,
                    kernel_init=nn.initializers.he_normal(),
                    dtype=self.dtype)(x)
        x = act(x)
        x = Norm(self.norm, dtype=self.dtype)(x, train)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        x = nn.Conv(self.filters, self.kernel_size, strides=stride,
                    use_bias=False, kernel_init=nn.initializers.he_normal(),
                    dtype=self.dtype)(x)
        x = act(x)
        x = Norm(self.norm, dtype=self.dtype)(x, train)
        return x


class ResidualBlock(nn.Module):
    """conv→norm→leaky_relu→conv→norm + skip (DLlib/module.py:202-220);
    `bayes` swaps the convs for Flipout variational convs."""

    norm: str = "instance_norm"
    groups: int = 1
    bayes: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from .bayes import FlipoutConv  # local import to avoid cycle
        dim = x.shape[-1]
        h = x
        if self.bayes:
            h = FlipoutConv(dim, (3, 3))(h)
        else:
            h = nn.Conv(dim, (3, 3), feature_group_count=self.groups,
                        use_bias=False,
                        kernel_init=nn.initializers.he_normal(),
                        dtype=self.dtype)(h)
        h = Norm(self.norm, dtype=self.dtype)(h, train)
        h = nn.leaky_relu(h, 0.2)
        if self.bayes:
            h = FlipoutConv(dim, (3, 3))(h)
        else:
            h = nn.Conv(dim, (3, 3), feature_group_count=self.groups,
                        use_bias=False,
                        kernel_init=nn.initializers.he_normal(),
                        dtype=self.dtype)(h)
        h = Norm(self.norm, dtype=self.dtype)(h, train)
        return x + h


class Upsample(nn.Module):
    """2× upsample: transpose conv or NN-interpolation + conv
    (DLlib/module.py:152-159)."""

    filters: int
    kernel_size: Sequence[int] = (2, 2)
    method: str = "conv_transpose"  # or "interpol_conv"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.method == "conv_transpose":
            return nn.ConvTranspose(self.filters, self.kernel_size,
                                    strides=(2, 2), dtype=self.dtype)(x)
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.filters, self.kernel_size, dtype=self.dtype)(x)


class TEEncoder(nn.Module):
    """TE-vector conditioning network: LSTM(6) over the echo axis then
    Dense(filters, relu) — the style input of the AdaIN conditioning
    (DLlib/module.py:384-389, 612-617)."""

    filters: int
    lstm_features: int = 6

    @nn.compact
    def __call__(self, te):
        # te: (nb, ne) or (nb, ne, 1)
        if te.ndim == 2:
            te = te[..., None]
        y = nn.RNN(nn.OptimizedLSTMCell(self.lstm_features))(te)[:, -1]
        return nn.relu(
            nn.Dense(self.filters,
                     kernel_init=nn.initializers.he_uniform())(y))
