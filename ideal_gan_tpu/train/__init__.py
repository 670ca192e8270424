"""Trainers mirroring the reference train-*.py entry points."""

from .common import TrainLoop, linear_decay_schedule, make_adam

__all__ = ["linear_decay_schedule", "make_adam", "TrainLoop"]
