"""Convolutional LSTM over the echo axis.

Replaces keras ConvLSTM2D(filters, 3, activation=leaky_relu) used as the
multi-echo front of UNet / PM_Generator / encoder (DLlib/module.py:370,
592, 800): consumes (nb, ne, H, W, C) and returns the final hidden state
(nb, H, W, filters). The cell activation is configurable because the
reference overrides keras' default tanh with leaky_relu.

The echo loop is a compile-time python loop (ne ≤ 12, static) — XLA sees a
short chain of convs, no dynamic control flow.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .blocks import get_activation


class ConvLSTM(nn.Module):
    filters: int
    kernel_size: tuple = (3, 3)
    activation: str = "leaky_relu"
    recurrent_activation: str = "sigmoid"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (nb, ne, H, W, C)
        nb, ne, h, w, _ = x.shape
        act = get_activation(self.activation)
        rec_act = get_activation(self.recurrent_activation)
        conv_x = nn.Conv(4 * self.filters, self.kernel_size,
                         kernel_init=nn.initializers.he_normal(),
                         dtype=self.dtype, name="input_conv")
        conv_h = nn.Conv(4 * self.filters, self.kernel_size, use_bias=False,
                         kernel_init=nn.initializers.orthogonal(),
                         dtype=self.dtype, name="recurrent_conv")
        hidden = jnp.zeros((nb, h, w, self.filters), self.dtype)
        cell = jnp.zeros((nb, h, w, self.filters), self.dtype)
        for e in range(ne):
            gates = conv_x(x[:, e]) + conv_h(hidden)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = rec_act(i)
            f = rec_act(f)
            o = rec_act(o)
            cell = f * cell + i * act(g)
            hidden = o * act(cell)
        return hidden
