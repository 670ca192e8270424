"""Variational (Flipout) convolution.

Replaces tfp.layers.Convolution2DFlipout (used by the Bayesian residual
blocks and decoders, DLlib/module.py:208,215,883-884,915-933): a mean-field
Gaussian posterior over the kernel with the Flipout pseudo-independent
perturbation estimator (Wen et al. 2018) — the perturbation ΔW·x is
decorrelated across batch elements by random ±1 sign matrices, giving
lower-variance gradients than naive reparameterization at the cost of one
extra conv.

The KL(q‖N(0,1)) term is stored via `self.sow('losses', 'kl', ...)`;
trainers sum the 'losses' collection into the objective (the TFP layer
added it to `model.losses`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _kl_gauss_std_normal(mean, log_sigma):
    """KL(N(mean, σ²) ‖ N(0, 1)) summed over all parameters."""
    sigma2 = jnp.exp(2.0 * log_sigma)
    return 0.5 * jnp.sum(jnp.square(mean) + sigma2 - 2.0 * log_sigma - 1.0)


class FlipoutConv(nn.Module):
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: int = 1
    activation: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        from .blocks import get_activation
        in_features = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_features, self.features)
        k_mean = self.param("kernel_mean",
                            nn.initializers.he_normal(), kshape)
        # TFP default: softplus(rho) with rho ~ N(-3, 0.1) → σ ≈ 0.05.
        k_log_sigma = self.param(
            "kernel_log_sigma",
            lambda key, shape: jnp.full(shape, -3.0), kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        conv = lambda v, kern: jax.lax.conv_general_dilated(
            v, kern, window_strides=(self.strides, self.strides),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        out = conv(x, k_mean)
        if not deterministic:
            rng = self.make_rng("bayes")
            r1, r2, r3 = jax.random.split(rng, 3)
            sigma = jnp.exp(k_log_sigma)
            eps = jax.random.normal(r1, kshape, self.dtype)
            delta_k = sigma * eps
            # Flipout: per-example random sign flips on input and output.
            sign_in = jax.random.rademacher(
                r2, (x.shape[0], 1, 1, in_features), self.dtype)
            sign_out = jax.random.rademacher(
                r3, (x.shape[0], 1, 1, self.features), self.dtype)
            out = out + conv(x * sign_in, delta_k) * sign_out
        out = out + bias
        self.sow("losses", "kl", _kl_gauss_std_normal(k_mean, k_log_sigma))
        if self.activation is not None:
            out = get_activation(self.activation)(out)
        return out
