"""Probability distributions as plain-jnp classes (replace TFP layers)."""

from .distributions import Normal, Rician, softplus_lb

__all__ = ["Normal", "Rician", "softplus_lb"]
