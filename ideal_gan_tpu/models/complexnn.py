"""Complex-valued network layers (rebuild of DLlib/complex_utils.py and
DLlib/bn.py, used by the experimental PM_complex U-Net).

Representation: native jnp complex64 arrays (NHWC). The reference built
complex convs from 4 real TF convs; here each complex conv is two real
convs on the real/imag planes combined as (RR−II, RI+IR) — the same math,
mapped to two MXU convolutions.

Activations: crelu / zrelu / modrelu / cardioid
(DLlib/complex_utils.py:324-406). Complex BN follows Trabelsi et al.: 2×2
covariance whitening with the closed-form inverse square root
(DLlib/bn.py:40-145), with learnable complex affine (Γ, β).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def crelu(z):
    return nn.relu(z.real) + 1j * nn.relu(z.imag)


def zrelu(z):
    """Pass z only when its phase is in [0, π/2]."""
    keep = (z.real >= 0) & (z.imag >= 0)
    return jnp.where(keep, z, 0.0 + 0.0j)


def modrelu(z, bias):
    """relu(|z| + b) · z/|z|."""
    mag = jnp.abs(z)
    scale = nn.relu(mag + bias) / jnp.maximum(mag, 1e-7)
    return z * scale.astype(z.dtype)


def cardioid(z):
    """0.5 · (1 + cos ∠z) · z."""
    pha = jnp.angle(z)
    return (0.5 * (1.0 + jnp.cos(pha))).astype(z.dtype) * z


_ACTS = {"crelu": crelu, "zrelu": zrelu, "cardioid": cardioid, None: lambda z: z,
         "none": lambda z: z}


class ComplexConv(nn.Module):
    """Complex 2-D convolution: (Wr + iWi) * (xr + ixi)
    (DLlib/complex_utils.py:9-92)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: int = 1
    activation: str | None = "crelu"
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        conv_r = nn.Conv(self.features, self.kernel_size,
                         strides=self.strides, use_bias=False,
                         kernel_init=nn.initializers.he_normal(),
                         dtype=self.dtype, name="w_real")
        conv_i = nn.Conv(self.features, self.kernel_size,
                         strides=self.strides, use_bias=False,
                         kernel_init=nn.initializers.he_normal(),
                         dtype=self.dtype, name="w_imag")
        xr, xi = z.real.astype(self.dtype), z.imag.astype(self.dtype)
        out_r = conv_r(xr) - conv_i(xi)
        out_i = conv_i(xr) + conv_r(xi)
        if self.use_bias:
            br = self.param("bias_real", nn.initializers.zeros,
                            (self.features,))
            bi = self.param("bias_imag", nn.initializers.zeros,
                            (self.features,))
            out_r = out_r + br
            out_i = out_i + bi
        out = out_r + 1j * out_i
        if self.activation == "modrelu":
            b = self.param("modrelu_bias", nn.initializers.zeros,
                           (self.features,))
            return modrelu(out, b)
        return _ACTS[self.activation](out)


class ComplexConvTranspose(nn.Module):
    """Complex transpose convolution (DLlib/complex_utils.py:95-236)."""

    features: int
    kernel_size: Sequence[int] = (2, 2)
    strides: Sequence[int] = (2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        conv_r = nn.ConvTranspose(self.features, self.kernel_size,
                                  strides=self.strides, dtype=self.dtype,
                                  name="w_real")
        conv_i = nn.ConvTranspose(self.features, self.kernel_size,
                                  strides=self.strides, dtype=self.dtype,
                                  name="w_imag")
        xr, xi = z.real.astype(self.dtype), z.imag.astype(self.dtype)
        return (conv_r(xr) - conv_i(xi)) + 1j * (conv_i(xr) + conv_r(xi))


def complex_max_pool_2x2(z):
    """2×2/stride-2 max pooling on |z|, carrying the complex value of the
    winning element (DLlib/complex_utils.py:239-321)."""
    b, h, w, c = z.shape
    win = z.reshape(b, h // 2, 2, w // 2, 2, c)
    win = jnp.moveaxis(win, 2, 4).reshape(b, h // 2, w // 2, 4, c)
    idx = jnp.argmax(jnp.abs(win), axis=3)
    return jnp.take_along_axis(win, idx[:, :, :, None, :], axis=3)[:, :, :, 0]


class ComplexBatchNorm(nn.Module):
    """Trabelsi-style complex batch normalization (DLlib/bn.py:148-510):
    whiten (re, im) jointly by the inverse square root of their 2×2
    covariance, then apply a complex affine (Γ, β). Running statistics live
    in the 'batch_stats' collection."""

    momentum: float = 0.9
    epsilon: float = 1e-4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        c = z.shape[-1]
        red = tuple(range(z.ndim - 1))

        ra_mean_r = self.variable("batch_stats", "mean_r",
                                  lambda: jnp.zeros((c,), self.dtype))
        ra_mean_i = self.variable("batch_stats", "mean_i",
                                  lambda: jnp.zeros((c,), self.dtype))
        ra_vrr = self.variable("batch_stats", "vrr",
                               lambda: jnp.full((c,), 1.0 / np.sqrt(2),
                                                self.dtype))
        ra_vii = self.variable("batch_stats", "vii",
                               lambda: jnp.full((c,), 1.0 / np.sqrt(2),
                                                self.dtype))
        ra_vri = self.variable("batch_stats", "vri",
                               lambda: jnp.zeros((c,), self.dtype))

        xr, xi = z.real.astype(self.dtype), z.imag.astype(self.dtype)
        if train:
            mu_r = jnp.mean(xr, axis=red)
            mu_i = jnp.mean(xi, axis=red)
            cr = xr - mu_r
            ci = xi - mu_i
            vrr = jnp.mean(cr * cr, axis=red) + self.epsilon
            vii = jnp.mean(ci * ci, axis=red) + self.epsilon
            vri = jnp.mean(cr * ci, axis=red)
            m = self.momentum
            if not self.is_initializing():
                ra_mean_r.value = m * ra_mean_r.value + (1 - m) * mu_r
                ra_mean_i.value = m * ra_mean_i.value + (1 - m) * mu_i
                ra_vrr.value = m * ra_vrr.value + (1 - m) * vrr
                ra_vii.value = m * ra_vii.value + (1 - m) * vii
                ra_vri.value = m * ra_vri.value + (1 - m) * vri
        else:
            mu_r, mu_i = ra_mean_r.value, ra_mean_i.value
            vrr, vii, vri = ra_vrr.value, ra_vii.value, ra_vri.value
            cr = xr - mu_r
            ci = xi - mu_i

        # Inverse square root of [[vrr, vri], [vri, vii]] via trace/det
        # closed form (DLlib/bn.py:63-85).
        tau = vrr + vii
        delta = vrr * vii - vri * vri
        s = jnp.sqrt(delta)
        t = jnp.sqrt(tau + 2.0 * s)
        inv_st = 1.0 / (s * t)
        wrr = (vii + s) * inv_st
        wii = (vrr + s) * inv_st
        wri = -vri * inv_st
        nr = wrr * cr + wri * ci
        ni = wri * cr + wii * ci

        g_rr = self.param("gamma_rr",
                          lambda k, s_: jnp.full(s_, 1.0 / np.sqrt(2)), (c,))
        g_ii = self.param("gamma_ii",
                          lambda k, s_: jnp.full(s_, 1.0 / np.sqrt(2)), (c,))
        g_ri = self.param("gamma_ri", nn.initializers.zeros, (c,))
        b_r = self.param("beta_r", nn.initializers.zeros, (c,))
        b_i = self.param("beta_i", nn.initializers.zeros, (c,))
        out_r = g_rr * nr + g_ri * ni + b_r
        out_i = g_ri * nr + g_ii * ni + b_i
        return out_r + 1j * out_i


class PMComplex(nn.Module):
    """Fully complex-valued U-Net (reference `PM_complex`,
    DLlib/module.py:689-778): complex conv blocks with ComplexBN, complex
    max-pool downsampling, complex transpose-conv upsampling, cardioid
    head. Input/output: complex64 NHWC."""

    filters: int = 72
    num_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        def block(v, filters):
            v = ComplexConv(filters, (3, 3), activation="crelu",
                            use_bias=False, dtype=self.dtype)(v)
            v = ComplexBatchNorm(dtype=self.dtype)(v, train)
            v = ComplexConv(filters, (3, 3), activation="crelu",
                            use_bias=False, dtype=self.dtype)(v)
            v = ComplexBatchNorm(dtype=self.dtype)(v, train)
            return v

        filters = self.filters
        skips = []
        for _ in range(self.num_layers):
            z = block(z, filters)
            skips.append(z)
            z = complex_max_pool_2x2(z)
            filters *= 2
        z = block(z, filters)
        for skip in reversed(skips):
            filters //= 2
            z = ComplexConvTranspose(filters, dtype=self.dtype)(z)
            z = jnp.concatenate([z, skip], axis=-1)
            z = block(z, filters)
        return ComplexConv(1, (1, 1), activation="cardioid",
                           dtype=self.dtype)(z)
