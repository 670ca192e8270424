"""Vector quantizer (Flax rebuild of DLlib/VectorQuantizer.py:8-67).

Nearest-code lookup via ‖x‖² − 2xW + ‖w‖², straight-through estimator, β
commitment loss and codebook loss sown into the 'losses' collection,
perplexity sown into 'metrics'.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class VectorQuantizer(nn.Module):
    embedding_dim: int
    num_embeddings: int
    commitment_cost: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.embedding_dim, self.num_embeddings))
        flat = x.reshape(-1, self.embedding_dim)
        dists = (jnp.sum(flat ** 2, axis=1, keepdims=True)
                 - 2.0 * flat @ codebook
                 + jnp.sum(codebook ** 2, axis=0, keepdims=True))
        idx = jnp.argmin(dists, axis=1)
        onehot = jax.nn.one_hot(idx, self.num_embeddings, dtype=self.dtype)
        quantized = (onehot @ codebook.T).reshape(x.shape)

        e_latent = jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - x))
        q_latent = jnp.mean(jnp.square(quantized - jax.lax.stop_gradient(x)))
        self.sow("losses", "vq_loss",
                 q_latent + self.commitment_cost * e_latent)

        avg_probs = jnp.mean(onehot, axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
        self.sow("metrics", "perplexity", perplexity)

        # Straight-through estimator.
        return x + jax.lax.stop_gradient(quantized - x)

    def quantize_indices(self, x):
        """Hard codebook indices for a latent grid (no gradients)."""
        codebook = self.get_variable("params", "codebook")
        flat = x.reshape(-1, self.embedding_dim)
        dists = (jnp.sum(flat ** 2, axis=1, keepdims=True)
                 - 2.0 * flat @ codebook
                 + jnp.sum(codebook ** 2, axis=0, keepdims=True))
        return jnp.argmin(dists, axis=1).reshape(x.shape[:-1])
