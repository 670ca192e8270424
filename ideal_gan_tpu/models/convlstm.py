"""Convolutional LSTM over the echo axis.

Replaces keras ConvLSTM2D(filters, 3, activation=leaky_relu) used as the
multi-echo front of UNet / PM_Generator / encoder (DLlib/module.py:370,
592, 800): consumes (nb, ne, H, W, C) and returns the final hidden state
(nb, H, W, filters). The cell activation is configurable because the
reference overrides keras' default tanh with leaky_relu.

The echo loop is a compile-time python loop (ne ≤ 12, static) — XLA sees a
short chain of convs, no dynamic control flow.

TPU scheduling (round-4 profile-driven redesign; docs/DESIGN.md):

- **One conv per echo.** The input and recurrent projections run as a
  single convolution over ``concat([x_e, hidden])`` with the two kernels
  concatenated along the input-channel axis — mathematically identical to
  ``conv_x(x_e) + conv_h(hidden)`` but it removes the separate gates-add
  pass over the (nb, H, W, 4F) tensor (≈300 MB at 384²·b8·F32 per echo,
  measured ~11 ms/step of pure HBM traffic on the unsup trainer) and
  halves the number of backward conv launches. The parameter tree keeps
  the reference-compatible ``input_conv``/``recurrent_conv`` split
  (kernels are concatenated at apply time), so keras ConvLSTM2D bridging
  and existing checkpoints are unaffected.
- **Rematerialized pointwise cell (custom_vjp).** The gate
  nonlinearities + state update form a `jax.custom_vjp` whose backward
  recomputes them from (gates, bias, cell) via plain `jax.vjp` instead
  of having autodiff save every intermediate activation tensor per echo
  — the linearization residuals (i/f/o/act(g)/act(c)… ≈ 6×75 MB per
  echo) were the dominant HBM cost of the backward (measured ~18
  ms/step of `mul` fusions). The bias add lives inside the cell so its
  gradient reduce fuses with the gate gradients instead of re-reading
  them from HBM. (`jax.checkpoint` was tried first and rejected: its
  optimization_barrier splits the backward into one HBM round-trip per
  intermediate — measured 3× the elementwise time.)
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from .blocks import get_activation


class _ConvParams(nn.Module):
    """Parameter-only holder producing the same {kernel[, bias]} leaves
    as the nn.Conv submodules the merged ConvLSTM replaced (checkpoint /
    bridge compatibility)."""

    shape: tuple  # (kh, kw, in, out)
    kernel_init: Callable
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape)
        b = (self.param("bias", nn.initializers.zeros_init(),
                        (self.shape[-1],))
             if self.use_bias else None)
        return k, b


def _cell_math(gates, bias, cell, act, rec_act):
    """LSTM state update from pre-activation gates (packed i, f, g, o —
    keras ConvLSTM2D order)."""
    g = gates + bias
    i, f, gg, o = jnp.split(g, 4, axis=-1)
    i = rec_act(i)
    f = rec_act(f)
    o = rec_act(o)
    cell = f * cell + i * act(gg)
    hidden = o * act(cell)
    return hidden, cell


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _cell(gates, bias, cell, act_name, rec_act_name):
    return _cell_math(gates, bias, cell, get_activation(act_name),
                      get_activation(rec_act_name))


def _cell_fwd(gates, bias, cell, act_name, rec_act_name):
    out = _cell(gates, bias, cell, act_name, rec_act_name)
    return out, (gates, bias, cell)


def _cell_bwd(act_name, rec_act_name, res, ct):
    # Rematerialize from (gates, bias, cell) via plain jax.vjp: XLA fuses
    # the recompute + gradient into one elementwise pass, and the bias
    # gradient's reduce fuses with the dgates producer. NOTE: this is
    # deliberately NOT jax.checkpoint — its optimization_barrier around
    # the residuals splits the backward into one HBM round-trip per
    # intermediate (measured 3× the elementwise time of this form).
    gates, bias, cell = res
    act = get_activation(act_name)
    rec_act = get_activation(rec_act_name)
    _, vjp = jax.vjp(
        lambda g, b, c: _cell_math(g, b, c, act, rec_act),
        gates, bias, cell)
    return vjp(ct)


_cell.defvjp(_cell_fwd, _cell_bwd)


class ConvLSTM(nn.Module):
    filters: int
    kernel_size: tuple = (3, 3)
    activation: str = "leaky_relu"
    recurrent_activation: str = "sigmoid"
    dtype: Any = jnp.float32
    # On TPU, run the recurrence as the fused Pallas kernel
    # (ops/pallas_convlstm.py): state resident in VMEM instead of
    # round-tripping HBM with F channels padded to 128 lanes. Elsewhere
    # (CPU tests/meshes) the unrolled XLA path below runs — identical
    # math, so the flag never changes results beyond f32 summation
    # order.
    #
    # Default policy (round-5 trainer-level hardware measurements,
    # docs/DESIGN.md "ConvLSTM backward, validated"): the fused path
    # engages for **bfloat16 compute on multi-channel inputs (Cin ≥ 2)**
    # — the operating point where the full fwd+bwd pair beats this
    # module's XLA form at the trainer level (unsup 138.0 vs 141.7 ms).
    # At f32 the pair measures 0.85× the XLA recurrence (the bwd
    # kernel's VMEM state stacks cap its halo efficiency at ~30 %), and
    # on Cin=1 magnitude inputs it regresses even at bf16 (mag 237.9 vs
    # 191.2 ms, single 83.8 vs 74.2), so those train on the XLA path.
    # Forward-only callers (serving/eval on hosts with local DMA, where
    # the kernel-level fused forward is 1.9–2.3×) opt in via
    # IDEAL_GAN_CONVLSTM_FUSED=1 — in this repo's tunnel environment
    # the e2e infer pipeline is host-transfer-bound and the opt-in is
    # NOT defaulted (cli/roi_analysis.py::make_infer_run note).
    # Env: unset/auto = bf16+Cin≥2 on TPU; "1" = any dtype/Cin on TPU;
    # "0" = never; "force" = anywhere (interpret off-TPU; tests).
    # auto and "1" both require VMEM viability and ≥0.5 forward halo
    # efficiency (ops.pallas_convlstm.fused_viable).
    fused: bool = True

    @nn.compact
    def __call__(self, x):
        # x: (nb, ne, H, W, C)
        nb, ne, h, w, cin = x.shape
        kh, kw = self.kernel_size
        k_x, bias = _ConvParams((kh, kw, cin, 4 * self.filters),
                                nn.initializers.he_normal(), use_bias=True,
                                name="input_conv")()
        k_h, _ = _ConvParams((kh, kw, self.filters, 4 * self.filters),
                             nn.initializers.orthogonal(),
                             name="recurrent_conv")()
        k_merged = jnp.concatenate([k_x, k_h], axis=2).astype(self.dtype)
        bias = bias.astype(self.dtype)

        env = os.environ.get("IDEAL_GAN_CONVLSTM_FUSED", "auto")
        auto_ok = (self.dtype == jnp.bfloat16 and cin >= 2
                   if env == "auto" else True)
        if auto_ok and env in ("auto", "1"):
            # VMEM viability: wide configs (e.g. F=72 at 384²) admit no
            # feasible backward block, and emitting the kernel anyway
            # HANGS the TPU compile helper. "auto" (training) requires
            # both kernels viable and falls back to the XLA recurrence;
            # "1" (the forward-only serving opt-in) checks the forward
            # only — differentiating a bwd-nonviable config under "1"
            # raises loudly in convlstm_bwd_pallas instead of hanging.
            # "force" (interpret-mode tests) skips the check. Both
            # engagement paths also require ≥0.5 forward halo
            # efficiency — below it the fused forward measured slower
            # than XLA (F=72 f32: 0.34 eff, 0.52× on the e2e serving
            # path; the measured wins sit at 0.61–0.67).
            from ..ops.pallas_convlstm import fused_viable
            itemsize = jnp.dtype(self.dtype).itemsize
            auto_ok = fused_viable(h, w, ne, self.filters, cin, itemsize,
                                   bwd=(env == "auto"), min_fwd_eff=0.5)
        if (self.fused and (kh, kw) == (3, 3) and env != "0" and auto_ok
                and (jax.default_backend() == "tpu" or env == "force")):
            from ..ops.pallas_convlstm import convlstm_fused
            return convlstm_fused(x.astype(self.dtype), k_merged, bias,
                                  self.activation,
                                  self.recurrent_activation)

        hidden = jnp.zeros((nb, h, w, self.filters), self.dtype)
        cell = jnp.zeros((nb, h, w, self.filters), self.dtype)
        dn = lax.conv_dimension_numbers(
            (nb, h, w, cin + self.filters), k_merged.shape,
            ("NHWC", "HWIO", "NHWC"))
        for e in range(ne):
            inp = jnp.concatenate([x[:, e].astype(self.dtype), hidden],
                                  axis=-1)
            gates = lax.conv_general_dilated(inp, k_merged, (1, 1), "SAME",
                                             dimension_numbers=dn)
            hidden, cell = _cell(gates, bias, cell, self.activation,
                                 self.recurrent_activation)
        return hidden
