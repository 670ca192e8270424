"""Adversarial loss families and gradient penalties (rebuild of
tf2gan/loss.py:6-127).

`adversarial_losses(mode)` returns (d_loss_fn, g_loss_fn) over logits for
mode ∈ {gan, hinge_v1, hinge_v2, lsgan, wgan}. Penalties take the critic as
a function of images (closures over params), with explicit PRNG keys for
the interpolation draws.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _bce_logits(labels, logits):
    # Stable sigmoid cross-entropy, mean-reduced.
    return jnp.mean(jnp.maximum(logits, 0) - logits * labels
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def adversarial_losses(mode: str) -> Tuple[Callable, Callable]:
    if mode == "gan":
        def d_loss_fn(r_logit, f_logit):
            return (_bce_logits(jnp.ones_like(r_logit), r_logit),
                    _bce_logits(jnp.zeros_like(f_logit), f_logit))

        def g_loss_fn(f_logit):
            return _bce_logits(jnp.ones_like(f_logit), f_logit)
    elif mode == "hinge_v1":
        def d_loss_fn(r_logit, f_logit):
            return (jnp.mean(jnp.maximum(1.0 - r_logit, 0.0)),
                    jnp.mean(jnp.maximum(1.0 + f_logit, 0.0)))

        def g_loss_fn(f_logit):
            return jnp.mean(jnp.maximum(1.0 - f_logit, 0.0))
    elif mode == "hinge_v2":
        def d_loss_fn(r_logit, f_logit):
            return (jnp.mean(jnp.maximum(1.0 - r_logit, 0.0)),
                    jnp.mean(jnp.maximum(1.0 + f_logit, 0.0)))

        def g_loss_fn(f_logit):
            return jnp.mean(-f_logit)
    elif mode == "lsgan":
        def d_loss_fn(r_logit, f_logit):
            return (jnp.mean(jnp.square(r_logit - 1.0)),
                    jnp.mean(jnp.square(f_logit)))

        def g_loss_fn(f_logit):
            return jnp.mean(jnp.square(f_logit - 1.0))
    elif mode == "wgan":
        def d_loss_fn(r_logit, f_logit):
            return -jnp.mean(r_logit), jnp.mean(f_logit)

        def g_loss_fn(f_logit):
            return -jnp.mean(f_logit)
    else:
        raise ValueError(f"unknown adversarial mode {mode!r}")
    return d_loss_fn, g_loss_fn


def gradient_penalty(critic: Callable, real: jnp.ndarray,
                     fake: jnp.ndarray | None, mode: str,
                     key: jax.Array) -> jnp.ndarray:
    """WGAN-GP / DRAGAN interpolated gradient penalty
    (tf2gan/loss.py:88-117)."""
    if mode == "none":
        return jnp.asarray(0.0, real.dtype)
    k1, k2 = jax.random.split(key)
    if mode == "dragan":
        beta = jax.random.uniform(k1, real.shape)
        fake = real + 0.5 * jnp.std(real) * beta
    elif mode != "wgan-gp":
        raise ValueError(f"unknown gp mode {mode!r}")
    shape = (real.shape[0],) + (1,) * (real.ndim - 1)
    alpha = jax.random.uniform(k2, shape)
    inter = real + alpha * (fake - real)

    def critic_sum(x):
        return jnp.sum(critic(x))

    grad = jax.grad(critic_sum)(inter)
    norm = jnp.sqrt(jnp.sum(jnp.square(grad.reshape(grad.shape[0], -1)),
                            axis=1) + 1e-12)
    return jnp.mean(jnp.square(norm - 1.0))


def r1_regularization(critic: Callable, real: jnp.ndarray) -> jnp.ndarray:
    """R1 = E[‖∇_x D(x)‖²] on real samples (tf2gan/loss.py:120-127)."""

    def critic_sum(x):
        return jnp.sum(critic(x))

    grad = jax.grad(critic_sum)(real)
    return jnp.mean(jnp.sum(jnp.square(grad.reshape(grad.shape[0], -1)),
                            axis=1))
