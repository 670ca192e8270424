"""Fourier-domain view of complex images (reference `FourierLayer`,
DLlib/module.py:223-248): 2-D FFT + fftshift of the (re, im) channels,
with multi-echo tensors folded into batch. Pure function (no params)."""

from __future__ import annotations

import jax.numpy as jnp


def fourier_layer(x: jnp.ndarray, multi_echo: bool = True) -> jnp.ndarray:
    ini_shape = x.shape
    if multi_echo and x.ndim == 5:
        x = x.reshape((-1,) + x.shape[2:])
    z = x[..., 0] + 1j * x[..., 1]
    zf = jnp.fft.fftshift(jnp.fft.fft2(z, axes=(1, 2)), axes=(1, 2))
    out = jnp.stack([jnp.real(zf), jnp.imag(zf)], axis=-1).astype(x.dtype)
    if multi_echo and len(ini_shape) == 5:
        out = out.reshape(ini_shape)
    return out
