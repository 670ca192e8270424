"""Heteroscedastic and Rician likelihood losses + phase disparity metric
(rebuild of tf2gan/loss.py:130-210).

Parity notes: `var_mse` reproduces the reference's exact form — it divides
the squared error by the *standard deviation* (not the variance) and adds
log σ (tf2gan/loss.py:130-140); `var_mse_r2` is the Rician NLL with the
reference's i0e-based stabilization and 1e-5 variance floor. The
reference's `RicianNLL` class is a broken stub (undefined sigma_min);
`rician_nll` here is the working distribution-based equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp


def var_mse(y_true: jnp.ndarray, y_pred: jnp.ndarray,
            var_floor: float = 1e-5) -> jnp.ndarray:
    """Gaussian-like heteroscedastic loss: mean((y−μ)²/σ + log σ) with the
    last-channel half of y_pred carrying the variance map."""
    idx = y_pred.shape[-1] // 2
    var_map = jnp.maximum(y_pred[..., idx:], var_floor)
    mu = y_pred[..., :idx]
    std_map = jnp.sqrt(var_map)
    msd = jnp.square(y_true - mu)
    return jnp.mean(msd / std_map + jnp.log(std_map))


def var_mse_r2(y_true: jnp.ndarray, y_pred: jnp.ndarray,
               var_floor: float = 1e-5,
               default_var: float = 1e-2) -> jnp.ndarray:
    """Rician negative log-likelihood for magnitude reconstructions
    (tf2gan/loss.py:143-162): −mean[log y − log σ² − (y²+ν²)/2σ²
    + log I0(yν/σ²) + yν/σ²-correction], with the log-I0 computed through
    i0e for stability."""
    if y_pred.shape[-1] > 1:
        idx = y_pred.shape[-1] // 2
        var_map = y_pred[..., idx:]
    else:
        idx = 1
        var_map = jnp.full_like(y_pred[..., :idx], default_var)
    nu = y_pred[..., :idx]
    var_map = jnp.maximum(var_map, var_floor)
    loglik = jnp.where(y_true > 1e-5, jnp.log(jnp.maximum(y_true, 1e-30)), 0.0)
    loglik -= jnp.log(var_map)
    loglik -= jnp.where(var_map > 0,
                        (jnp.square(y_true) + jnp.square(nu)) / (2 * var_map),
                        0.0)
    z = jnp.where(var_map > 0, y_true * nu / var_map, 0.0)
    i0e_z = jsp.i0e(z)
    loglik += jnp.where(i0e_z > 0.0, jnp.log(i0e_z), 0.0)
    loglik += z
    return jnp.mean(-loglik)


def rician_nll(y_true: jnp.ndarray, dist) -> jnp.ndarray:
    """Mean negative log-likelihood under a prob.Rician posterior (working
    replacement for the reference's broken RicianNLL stub,
    tf2gan/loss.py:181-210)."""
    return -jnp.mean(dist.log_prob(y_true))


def absolute_phase_disparity(y_true: jnp.ndarray,
                             y_pred: jnp.ndarray) -> jnp.ndarray:
    """Magnitude-weighted |∠(y·ŷ*)| (tf2gan/loss.py:165-178).

    Inputs carry [magnitude, phase/π] in the last two channels of 5-D
    map tensors; returns the per-batch weighted mean phase error.
    """
    t_mag = y_true[..., :1]
    t_re = t_mag * jnp.cos(y_true[..., 1:] * np.pi)
    t_im = t_mag * jnp.sin(y_true[..., 1:] * np.pi)
    p_re = y_pred[..., :1] * jnp.cos(y_pred[..., 1:] * np.pi)
    p_im = y_pred[..., :1] * jnp.sin(y_pred[..., 1:] * np.pi)
    prod_re = t_re * p_re + t_im * p_im
    prod_im = -t_re * p_im + t_im * p_re
    pha = jnp.arctan2(prod_im, prod_re)
    axes = tuple(range(1, y_true.ndim))
    num = jnp.sum(t_mag * jnp.abs(pha), axis=axes)
    den = jnp.sum(t_mag, axis=axes)
    return jnp.where(den > 0, num / den, 0.0)
