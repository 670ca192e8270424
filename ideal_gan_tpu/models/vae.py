"""PI-VAE encoder and decoders (Flax rebuild of DLlib/module.py:781-938).

The reference's TFP `IndependentNormal` + `KLDivergenceRegularizer` head is
replaced by an explicit (μ, σ) posterior: `Encoder` returns a
`prob.Normal` over the latent grid when `sd_out`, and trainers sample with
an explicit key and add `normal.kl_to_std_normal()` (× ls_reg_weight) to
the loss — same objective, functional form.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..prob import Normal
from .attention import SelfAttention
from .blocks import Norm, ResidualBlock, Upsample, get_activation
from .convlstm import ConvLSTM


def _filter_list(filters, num_layers: int) -> list:
    """Per-level filter widths: int → doubling schedule, sequence → as
    given (reference `--n_G_filt_list` semantics,
    train-IDEAL-GAN.py:67-68 / DLlib/module.py:797-798,861-863)."""
    if isinstance(filters, (list, tuple)):
        filters = list(filters)
        if len(filters) != num_layers + 1:
            raise ValueError(
                f"filter list must have num_layers+1={num_layers + 1} "
                f"entries, got {len(filters)}")
        return filters
    return [filters * 2 ** k for k in range(num_layers + 1)]


class Encoder(nn.Module):
    """conv stem (+ ConvLSTM multi-echo front) → num_layers × [res-blocks,
    stride-2 conv] → optional res+SA+res → latent head
    (DLlib/module.py:781-838)."""

    encoded_dims: int
    multi_echo: bool = True
    filters: Any = 36   # int, or per-level tuple of len num_layers+1
    num_layers: int = 4
    num_res_blocks: int = 2
    sd_out: bool = True
    ls_mean_activ: str = "leaky_relu"
    nl_self_attention: bool = True
    norm: str = "instance_norm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        filters = _filter_list(self.filters, self.num_layers)
        if self.multi_echo:
            x = ConvLSTM(filters[0], dtype=self.dtype)(x)
        x = nn.Conv(filters[0], (3, 3),
                    kernel_init=nn.initializers.he_normal(),
                    dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        for l in range(self.num_layers):
            for _ in range(self.num_res_blocks):
                x = ResidualBlock(self.norm, dtype=self.dtype)(x, train)
            x = nn.Conv(filters[l + 1], (3, 3), strides=2,
                        kernel_init=nn.initializers.he_normal(),
                        dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        if self.nl_self_attention:
            x = ResidualBlock(self.norm, dtype=self.dtype)(x, train)
            x = SelfAttention(dtype=self.dtype)(x)
            x = ResidualBlock(self.norm, dtype=self.dtype)(x, train)
        act = get_activation(
            None if self.ls_mean_activ == "None" else self.ls_mean_activ)
        x = nn.Conv(self.encoded_dims, (3, 3),
                    kernel_init=nn.initializers.he_normal(),
                    dtype=self.dtype)(x)
        x = act(x)
        if self.sd_out:
            mean = nn.Conv(self.encoded_dims, (1, 1),
                           kernel_init=nn.initializers.he_normal(),
                           dtype=self.dtype)(x)
            mean = act(mean)
            std = nn.Conv(self.encoded_dims, (1, 1),
                          kernel_init=nn.initializers.he_normal(),
                          dtype=self.dtype)(x)
            # relu head as the reference; floored so the KL term stays
            # finite (TFP tolerated degenerate scale=0 at init).
            std = nn.relu(std) + 1e-6
            return Normal(loc=mean, scale=std)
        return nn.Conv(self.encoded_dims, (1, 1), dtype=self.dtype)(x)


class Decoder(nn.Module):
    """conv stem → optional res+SA+res → num_layers × [NN-upsample+conv,
    res-blocks] → norm → head; optional Flipout re/im split head
    (DLlib/module.py:841-891)."""

    encoded_dims: int
    n_out: int
    multi_echo: bool = True
    n_groups: int = 1
    filters: Any = 36   # int, or per-level tuple of len num_layers+1
    num_layers: int = 4
    num_res_blocks: int = 2
    output_activation: str = "tanh"
    bayes_layer: bool = False
    nl_self_attention: bool = True
    norm: str = "instance_norm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from .bayes import FlipoutConv
        filters = _filter_list(self.filters, self.num_layers)[::-1]
        x = nn.Conv(self.encoded_dims, (3, 3),
                    kernel_init=nn.initializers.he_normal(),
                    dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(filters[0], (3, 3),
                    kernel_init=nn.initializers.he_normal(),
                    dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        if self.nl_self_attention:
            x = ResidualBlock(self.norm, dtype=self.dtype)(x, train)
            x = SelfAttention(dtype=self.dtype)(x)
            x = ResidualBlock(self.norm, dtype=self.dtype)(x, train)
        for l in range(self.num_layers):
            x = Upsample(filters[l + 1], method="interpol_conv",
                         dtype=self.dtype)(x)
            for _ in range(self.num_res_blocks):
                x = ResidualBlock(self.norm, groups=self.n_groups,
                                  dtype=self.dtype)(x, train)
        x = Norm(self.norm, dtype=self.dtype)(x, train)
        act = get_activation(self.output_activation)
        if self.bayes_layer:
            x = nn.Conv(filters[-1], (3, 3),
                        feature_group_count=self.n_groups,
                        kernel_init=nn.initializers.glorot_normal(),
                        dtype=self.dtype)(x)
            x = act(x)
            half = filters[-1] // 2
            x_r = FlipoutConv(1, (3, 3),
                              activation=self.output_activation)(x[..., :half],
                                                                 not train)
            x_i = FlipoutConv(1, (3, 3),
                              activation=self.output_activation)(x[..., half:],
                                                                 not train)
            out = jnp.concatenate([x_r, x_i], axis=-1)
        else:
            out = nn.Conv(self.n_out, (3, 3),
                          feature_group_count=self.n_groups,
                          kernel_init=nn.initializers.glorot_normal(),
                          dtype=self.dtype)(x)
            out = act(out)
        if self.multi_echo:
            out = out[:, None]
        return out


class BayesDecoder(nn.Module):
    """Fully-Flipout decoder with separate real/imag towers
    (DLlib/module.py:894-938)."""

    encoded_dims: int
    filters: int = 36
    num_layers: int = 4
    num_res_blocks: int = 2
    output_activation: Optional[str] = None
    nl_self_attention: bool = True
    norm: str = "instance_norm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from .bayes import FlipoutConv
        filt_ini = self.filters * (2 ** self.num_layers)
        x = FlipoutConv(self.encoded_dims, (3, 3),
                        activation="leaky_relu")(x, not train)
        half = self.encoded_dims // 2
        towers = []
        for part in (x[..., :half], x[..., half:]):
            h = FlipoutConv(filt_ini, (3, 3),
                            activation="leaky_relu")(part, not train)
            if self.nl_self_attention:
                h = ResidualBlock(self.norm, bayes=True,
                                  dtype=self.dtype)(h, train)
                h = SelfAttention(dtype=self.dtype)(h)
                h = ResidualBlock(self.norm, bayes=True,
                                  dtype=self.dtype)(h, train)
            filt = filt_ini
            for _ in range(self.num_layers):
                filt //= 2
                h = Upsample(filt, method="interpol_conv",
                             dtype=self.dtype)(h)
                for _ in range(self.num_res_blocks):
                    h = ResidualBlock(self.norm, bayes=True,
                                      dtype=self.dtype)(h, train)
            h = Norm(self.norm, dtype=self.dtype)(h, train)
            h = FlipoutConv(1, (3, 3),
                            activation=self.output_activation)(h, not train)
            towers.append(h)
        out = jnp.concatenate(towers, axis=-1)
        return out[:, None]
