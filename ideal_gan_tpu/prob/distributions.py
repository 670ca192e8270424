"""Rician and Normal map posteriors.

TPU-native replacement for the reference's TFP machinery: the custom
`Rician(tfd.Distribution)` (DLlib/module.py:19-134) and the
`DistributionLambda` Normal heads (DLlib/module.py:441-455). Implemented as
plain pytree-compatible classes — jittable, vmappable, and usable straight
out of network heads as (μ, σ) pairs.

Numerics match the reference: Bessel ratios through the exponentially
scaled i0e/i1e (jax.scipy.special), σ floored, Rician log_prob zeroed for
x ≤ 0, mean/variance via the Laguerre-½ polynomial.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp

_HALF_LOG_2PI = 0.5 * np.log(2.0 * np.pi)


def softplus_lb(x, lb: float = 1e-5):
    """softplus with a lower bound (reference `softplus_lb`,
    DLlib/module.py:14-16 usage pattern)."""
    return jax.nn.softplus(x) + lb


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Normal:
    loc: jnp.ndarray
    scale: jnp.ndarray

    def mean(self):
        return self.loc

    def variance(self):
        return jnp.square(self.scale)

    def stddev(self):
        return self.scale

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * jnp.square(z) - jnp.log(self.scale) - _HALF_LOG_2PI

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + jnp.shape(self.loc)
        return self.loc + self.scale * jax.random.normal(key, shape)

    def kl_to_std_normal(self):
        var = jnp.square(self.scale)
        return 0.5 * (jnp.square(self.loc) + var - jnp.log(var) - 1.0)

    def tree_flatten(self):
        return (self.loc, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Rician:
    """Rician distribution with stable i0e/i1e numerics
    (DLlib/module.py:19-134).

    nu ≥ 0 is the noncentrality (signal) parameter, sigma > 0 the noise
    scale. sigma is floored at 1e-10 as in the reference.
    """

    nu: jnp.ndarray
    sigma: jnp.ndarray
    _sigma_floor: float = 1e-10

    def _sig(self):
        return jnp.maximum(self.sigma, self._sigma_floor)

    def log_prob(self, x):
        """log p(x) = log x − 2 log σ − (x²+ν²)/2σ² + log I0(xν/σ²),
        computed via i0e: log I0(z) = log i0e(z) + z (z ≥ 0); zeroed for
        x ≤ 0 as the reference does (DLlib/module.py:55-84)."""
        sig = self._sig()
        sig2 = jnp.square(sig)
        xp = jnp.maximum(x, self._sigma_floor)
        z = xp * self.nu / sig2
        log_i0 = jnp.log(jsp.i0e(z)) + jnp.abs(z)
        lp = (jnp.log(xp) - 2.0 * jnp.log(sig)
              - (jnp.square(xp) + jnp.square(self.nu)) / (2.0 * sig2)
              + log_i0)
        return jnp.where(x > 0, lp, 0.0)

    def _laguerre_half(self, x):
        """L_{1/2}(x) for x ≤ 0 via scaled Bessels:
        L½(x) = e^{x/2}[(1−x)I0(−x/2) − x·I1(−x/2)]; with x ≤ 0 and
        I(z) = i(z)·e^{|z|} the e^{x/2} cancels the rescaling exactly:
        L½(x) = (1−x)·i0e(−x/2) − x·i1e(−x/2)."""
        half = -0.5 * x
        return (1.0 - x) * jsp.i0e(half) - x * jsp.i1e(half)

    def mean(self):
        sig = self._sig()
        arg = -0.5 * jnp.square(self.nu) / jnp.square(sig)
        return sig * jnp.sqrt(np.pi / 2.0) * self._laguerre_half(arg)

    def variance(self):
        sig = self._sig()
        return (2.0 * jnp.square(sig) + jnp.square(self.nu)
                - jnp.square(self.mean()))

    def mode_param(self):
        """ν — used by trainers as the 'clean signal' point estimate."""
        return self.nu

    def sample(self, key, sample_shape=()):
        """√((X+ν)² + Y²) with X, Y ~ N(0, σ²) (DLlib/module.py:87-95)."""
        shape = tuple(sample_shape) + jnp.shape(self.nu)
        kx, ky = jax.random.split(key)
        sig = self._sig()
        x = self.nu + sig * jax.random.normal(kx, shape)
        y = sig * jax.random.normal(ky, shape)
        return jnp.sqrt(jnp.square(x) + jnp.square(y))

    def tree_flatten(self):
        return (self.nu, self.sigma), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
