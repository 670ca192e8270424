"""Differentiable multi-peak IDEAL physics signal model (TPU-native)."""

from .constants import (
    FM_SC,
    R2_SC,
    RHO_SC,
    FATTY_ACID_9PEAK,
    GYRO_HZ_PER_T,
    SpeciesModel,
    WATER_FAT_7PEAK,
)
from .matrix import (
    eigenvals_2x2,
    mag_design_matrix,
    model_matrix,
    null_projector,
    phase_constraint_matrix,
    pinv_normal,
    small_inv,
)
from .ops import (
    CSEMagResult,
    cse_mag_fit,
    cycle,
    cycle_full,
    fit_rho,
    mag_cycle,
    synthesize,
    synthesize_mag,
    synthesize_mag_phase,
)
from .fa import fa_cycle, fa_forward, fa_get_rho
from .te import sample_te_train, te_train, te_train_for_field
from .uncertainty import Posterior, acq_uncertainty, pdff_uncertainty

__all__ = [
    "FM_SC", "R2_SC", "RHO_SC", "GYRO_HZ_PER_T",
    "SpeciesModel", "WATER_FAT_7PEAK", "FATTY_ACID_9PEAK",
    "model_matrix", "pinv_normal", "small_inv", "null_projector",
    "phase_constraint_matrix", "mag_design_matrix", "eigenvals_2x2",
    "synthesize", "synthesize_mag", "synthesize_mag_phase",
    "cycle", "cycle_full", "fit_rho", "cse_mag_fit", "mag_cycle", "CSEMagResult",
    "te_train", "te_train_for_field", "sample_te_train",
    "fa_cycle", "fa_forward", "fa_get_rho",
    "Posterior", "pdff_uncertainty", "acq_uncertainty",
]
