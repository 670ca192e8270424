"""Pallas TPU kernels and low-level array ops."""

from .pallas_ideal import (cycle_full_fused, cycle_fused, fit_rho_fused,
                           synthesize_fused)

__all__ = ["fit_rho_fused", "cycle_fused", "cycle_full_fused",
           "synthesize_fused"]
