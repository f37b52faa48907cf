"""Dataset loaders (parity: reference `vod_datasets/loaders/`)."""

from .beir import BeirDatasetLoader

__all__ = ["BeirDatasetLoader"]
