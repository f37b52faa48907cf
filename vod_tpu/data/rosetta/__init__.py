"""Rosetta: translate arbitrary QA/retrieval datasets into the canonical
query/section schema (parity: reference `src/vod_datasets/rosetta/`)."""

from .models import QueryModel, QueryWithContextsModel, SectionModel
from .adapters import ADAPTERS, find_adapter, transform

__all__ = [
    "ADAPTERS",
    "QueryModel",
    "QueryWithContextsModel",
    "SectionModel",
    "find_adapter",
    "transform",
]
