"""DDPM/DDIM schedules and samplers."""

from .schedules import DiffusionSchedule, cosine_beta_schedule, linear_beta_schedule
from .sampling import (
    ddim_reverse_step,
    ddim_sample,
    ddpm_reverse_step,
    ddpm_sample,
    forward_noise,
    sample_timesteps,
)

__all__ = [
    "DiffusionSchedule", "linear_beta_schedule", "cosine_beta_schedule",
    "forward_noise", "sample_timesteps",
    "ddpm_reverse_step", "ddim_reverse_step", "ddpm_sample", "ddim_sample",
]
