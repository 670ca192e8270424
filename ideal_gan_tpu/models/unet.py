"""U-Net model family (Flax rebuild of DLlib/module.py:345-686).

Three architectures share the encoder/decoder machinery:

- `UNet`: the workhorse — optional multi-echo ConvLSTM front, TE-vector
  LSTM→AdaIN conditioning at every encoder level, skip connections,
  first-decoder-level self-attention, and Bayesian heads that return
  `prob.Normal` (tanh head) or `prob.Rician` (otherwise) posteriors
  instead of TFP DistributionLambda outputs.
- `MDWFNet` (reference `MDWF_Generator`): shared encoder, three decoders
  (water/fat sigmoid-2ch, R2* relu-1ch, field-map tanh-1ch) with
  per-decoder self-attention flags and Dense TE injection at level 1.
- `VETNet` (reference `PM_Generator`): shared encoder, two decoders
  (R2* sigmoid, field-map tanh) with the ConvLSTM multi-echo front and
  LSTM→AdaIN TE conditioning; ME output (nb, 1, H, W, [FM, R2*]).

All operate in NHWC with static shapes; echo folding for non-ME 5-D inputs
reshapes echoes into batch exactly like the reference's Lambda layers.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..prob import Normal, Rician
from .attention import SelfAttention, adain
from .blocks import ConvBlock, TEEncoder, Upsample, get_activation
from .convlstm import ConvLSTM


def _make_remat(cls, **kw):
    """nn.remat with the ORIGINAL class name, so remat=True and
    remat=False produce identical param trees (flax would otherwise
    auto-name the transformed modules 'Checkpoint<Cls>_k', breaking
    checkpoint compatibility)."""
    t = nn.remat(cls, **kw)
    t.__name__ = cls.__name__
    return t


# static_argnums indexes the bound call INCLUDING self (self=0, x=1,
# train=2): train must stay static so configs that branch on it
# (dropout > 0, batch_norm) survive the remat trace
_RematConvBlock = _make_remat(ConvBlock, static_argnums=(2,))
_RematConvLSTM = _make_remat(ConvLSTM)
_RematUpsample = _make_remat(Upsample)


def _maybe_remat(remat: bool):
    """Per-block rematerialization: under `remat=True` every conv block /
    ConvLSTM front / upsample recomputes its activations in the backward
    pass instead of storing them — peak activation memory drops from
    O(depth) feature maps to O(1) per level at ~1.25× step FLOPs. This is
    what lets the TE-aug trainer run the reference's 72-filter width at
    384² on one 16 GB v5e chip (OOM without it —
    benchmarks/train_step_time.py). Param trees are identical with and
    without remat (same module names), so checkpoints interchange."""
    if not remat:
        return ConvBlock, ConvLSTM, Upsample
    return _RematConvBlock, _RematConvLSTM, _RematUpsample


class UNet(nn.Module):
    n_out: int = 1
    skip_con: bool = True
    bayesian: bool = False
    std_out: bool = False
    me_layer: bool = False
    te_input: bool = False
    cse_layer: bool = False
    field: float = 1.5
    r2_sc: float = 200.0
    filters: int = 72
    num_layers: int = 4
    dropout: float = 0.0
    output_activation: str = "tanh"
    self_attention: bool = False
    norm: str = "instance_norm"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, te: Optional[jnp.ndarray] = None,
                 train: bool = True):
        Block, Lstm, Up = _maybe_remat(self.remat)
        inputs_acqs = x  # kept for the CSE physics layer
        folded_echoes = None
        if self.me_layer:
            x = Lstm(self.filters, dtype=self.dtype)(x)
        elif x.ndim == 5:
            nb, ne = x.shape[0], x.shape[1]
            folded_echoes = (nb, ne)
            x = x.reshape((nb * ne,) + x.shape[2:])

        filters = self.filters
        skips = []
        for _ in range(self.num_layers):
            x = Block(filters, self.dropout, norm=self.norm,
                      dtype=self.dtype)(x, train)
            if self.te_input:
                y = TEEncoder(filters)(te)
                x = adain(x, y)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            filters *= 2

        x = Block(filters, self.dropout, norm=self.norm,
                  dtype=self.dtype)(x, train)

        for cont, skip in enumerate(reversed(skips)):
            filters //= 2
            x = Up(filters, dtype=self.dtype)(x)
            if self.skip_con:
                x = jnp.concatenate([x, skip], axis=-1)
            if self.self_attention and cont == 0:
                x = SelfAttention(dtype=self.dtype)(x)
            x = Block(filters, self.dropout, norm=self.norm,
                      dtype=self.dtype)(x, train)

        out = nn.Conv(self.n_out, (1, 1),
                      kernel_init=nn.initializers.glorot_normal(),
                      dtype=self.dtype)(x)
        out = get_activation(self.output_activation)(out)
        if self.me_layer:
            out = out[:, None]
        if folded_echoes is not None:
            nb, ne = folded_echoes
            out = out.reshape((nb, ne) + out.shape[1:])

        if self.cse_layer:
            # physics-in-model: reproject the input acquisitions through
            # the IDEAL cycle using the predicted (FM, R2*) maps
            # (reference CSE_layer option appends wf.CSE_to_CSE_Layer,
            # DLlib/module.py:431-433)
            from ..physics import cycle, te_train_for_field
            te_cse = te
            if te_cse is None:
                te_cse = te_train_for_field(
                    inputs_acqs.shape[1], inputs_acqs.shape[0], self.field)
            elif te_cse.ndim == 2:
                te_cse = te_cse[..., None]
            return cycle(inputs_acqs, out, te_cse, field=self.field,
                         r2_sc=self.r2_sc)

        if self.bayesian or self.std_out:
            x_std = nn.Conv(16, (1, 1),
                            kernel_init=nn.initializers.he_uniform(),
                            dtype=self.dtype)(x)
            x_std = nn.relu(x_std)
            sigma = nn.Conv(self.n_out, (1, 1),
                            kernel_init=nn.initializers.he_normal(),
                            dtype=self.dtype)(x_std)
            sigma = nn.sigmoid(sigma)
            if self.me_layer:
                sigma = sigma[:, None]
            if folded_echoes is not None:
                nb, ne = folded_echoes
                sigma = sigma.reshape((nb, ne) + sigma.shape[1:])
            if self.bayesian:
                if self.output_activation == "tanh":
                    return Normal(loc=out, scale=sigma)
                return Rician(nu=out, sigma=sigma)
            return out, sigma
        return out


class _SharedEncoder(nn.Module):
    """Encoder trunk shared by the multi-decoder generators."""

    filters: int
    num_layers: int
    dropout: float
    norm: str
    te_input: bool
    te_mode: str  # "adain" (every level) or "dense_l1" (add at level 1)
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, te, train: bool = True):
        Block, _, _ = _maybe_remat(self.remat)
        filters = self.filters
        skips = []
        for level in range(self.num_layers):
            x = Block(filters, self.dropout, norm=self.norm,
                      dtype=self.dtype)(x, train)
            if self.te_input and self.te_mode == "adain":
                y = TEEncoder(filters)(te)
                x = adain(x, y)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if self.te_input and self.te_mode == "dense_l1" and level == 1:
                # Dense(filters)→broadcast over the latent grid, added
                # (DLlib/module.py:492-501).
                if te.ndim == 3:
                    te_vec = te[..., 0]
                else:
                    te_vec = te
                y = nn.Dense(filters,
                             kernel_init=nn.initializers.he_uniform())(te_vec)
                y = nn.relu(y)
                x = x + y[:, None, None, :]
            filters *= 2
        x = Block(filters, self.dropout, norm=self.norm,
                  dtype=self.dtype)(x, train)
        return x, skips, filters


class _Decoder(nn.Module):
    """One decoder branch: per level upsample → concat skip →
    (self-attention at level 0) → conv block; 1×1 head."""

    filters_top: int
    num_layers: int
    dropout: float
    norm: str
    n_out: int
    head_activation: str
    self_attention: bool
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips: Sequence[jnp.ndarray], train: bool = True):
        Block, _, Up = _maybe_remat(self.remat)
        filters = self.filters_top
        for cont, skip in enumerate(reversed(list(skips))):
            filters //= 2
            x = Up(filters, dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            if self.self_attention and cont == 0:
                x = SelfAttention(dtype=self.dtype)(x)
            x = Block(filters, self.dropout, norm=self.norm,
                      dtype=self.dtype)(x, train)
        out = nn.Conv(self.n_out, (1, 1),
                      kernel_init=nn.initializers.glorot_normal(),
                      dtype=self.dtype)(x)
        return get_activation(self.head_activation)(out)


class MDWFNet(nn.Module):
    """Reference `MDWF_Generator` (DLlib/module.py:465-569): shared encoder
    + 3 decoders; output channels [WF sigmoid ×2, R2* relu, FM tanh]."""

    filters: int = 72
    num_layers: int = 4
    dropout: float = 0.0
    te_input: bool = False
    wf_self_attention: bool = False
    r2_self_attention: bool = False
    fm_self_attention: bool = True
    norm: str = "instance_norm"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, te=None, train: bool = True):
        x, skips, ftop = _SharedEncoder(
            self.filters, self.num_layers, self.dropout, self.norm,
            self.te_input, "dense_l1", remat=self.remat,
            dtype=self.dtype)(x, te, train)
        dec = lambda n_out, act, sa, name: _Decoder(
            ftop, self.num_layers, self.dropout, self.norm, n_out, act, sa,
            remat=self.remat, dtype=self.dtype, name=name)(x, skips, train)
        wf = dec(2, "sigmoid", self.wf_self_attention, "dec_wf")
        r2 = dec(1, "relu", self.r2_self_attention, "dec_r2")
        fm = dec(1, "tanh", self.fm_self_attention, "dec_fm")
        return jnp.concatenate([wf, r2, fm], axis=-1)


class VETNet(nn.Module):
    """Reference `PM_Generator` (DLlib/module.py:572-686) — VET-Net when
    `te_input=True`: ConvLSTM multi-echo front, shared encoder with
    LSTM→AdaIN TE conditioning, 2 decoders (R2* sigmoid / FM tanh).
    ME output (nb, 1, H, W, [FM, R2*]); non-ME output (..., [R2*, FM])."""

    n_out: int = 1
    me_layer: bool = True
    te_input: bool = False
    filters: int = 72
    num_layers: int = 4
    dropout: float = 0.0
    r2_self_attention: bool = False
    fm_self_attention: bool = True
    norm: str = "instance_norm"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, te=None, train: bool = True):
        folded = None
        _, Lstm, _ = _maybe_remat(self.remat)
        if self.me_layer:
            x = Lstm(self.filters, dtype=self.dtype)(x)
        elif x.ndim == 5:
            nb, ne = x.shape[0], x.shape[1]
            folded = (nb, ne)
            x = x.reshape((nb * ne,) + x.shape[2:])
        x, skips, ftop = _SharedEncoder(
            self.filters, self.num_layers, self.dropout, self.norm,
            self.te_input, "adain", remat=self.remat,
            dtype=self.dtype)(x, te, train)
        r2 = _Decoder(ftop, self.num_layers, self.dropout, self.norm,
                      self.n_out, "sigmoid", self.r2_self_attention,
                      remat=self.remat, dtype=self.dtype,
                      name="dec_r2")(x, skips, train)
        fm = _Decoder(ftop, self.num_layers, self.dropout, self.norm,
                      self.n_out, "tanh", self.fm_self_attention,
                      remat=self.remat, dtype=self.dtype,
                      name="dec_fm")(x, skips, train)
        if self.me_layer:
            return jnp.concatenate([fm, r2], axis=-1)[:, None]
        out = jnp.concatenate([r2, fm], axis=-1)
        if folded is not None:
            nb, ne = folded
            out = out.reshape((nb, ne) + out.shape[1:])
        return out
