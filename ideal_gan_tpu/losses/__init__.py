"""Losses: adversarial families, gradient penalties, heteroscedastic and
Rician NLLs, phase metrics, TV/L1 regularizers."""

from .gan import (
    adversarial_losses,
    gradient_penalty,
    r1_regularization,
)
from .heteroscedastic import (
    absolute_phase_disparity,
    rician_nll,
    var_mse,
    var_mse_r2,
)
from .regs import l1_mean, total_variation, total_variation_2d

__all__ = [
    "adversarial_losses", "gradient_penalty", "r1_regularization",
    "var_mse", "var_mse_r2", "rician_nll", "absolute_phase_disparity",
    "total_variation", "total_variation_2d", "l1_mean",
]
