"""Pallas TPU kernels and low-level array ops."""

from .pallas_ideal import (cse_mag_fused, cycle_full_fused, cycle_fused,
                           fit_rho_fused, fit_rho_planar,
                           precompute_fit_matrices, synthesize_fused)

__all__ = ["fit_rho_fused", "fit_rho_planar", "cycle_fused",
           "cycle_full_fused", "synthesize_fused",
           "precompute_fit_matrices", "cse_mag_fused"]
