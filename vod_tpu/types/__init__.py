"""Core data types (parity: reference `src/vod_types/`)."""

from .retrieval import PAD_INDEX, PAD_LABEL, PAD_SCORE, RetrievalBatch, stack_samples
from .batch import RealmBatch, RealmOutput

__all__ = [
    "PAD_INDEX",
    "PAD_LABEL",
    "PAD_SCORE",
    "RetrievalBatch",
    "RealmBatch",
    "RealmOutput",
    "stack_samples",
]
