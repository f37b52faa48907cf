"""Experiment recipes + CLI (parity: reference `src/vod_exps/`)."""

from .recipes import PeriodicTrainingConfig, periodic_training

__all__ = ["PeriodicTrainingConfig", "periodic_training"]
