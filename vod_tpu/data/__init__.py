"""Dataset layer (parity: reference `src/vod_datasets/`): rosetta universal-schema
adapters, sectioning, loaders, and host->device corpus tokenization."""

from .rosetta.models import QueryModel, QueryWithContextsModel, SectionModel
from .rosetta.adapters import find_adapter, transform
from .preprocessing import isolate_qa_and_sections
from .sectioning import FixedLengthSectionizer, SentenceSectionizer
from .interface import load_dataset, load_queries, load_sections
from .corpus import tokenize_corpus, tokenize_queries

__all__ = [
    "FixedLengthSectionizer",
    "QueryModel",
    "QueryWithContextsModel",
    "SectionModel",
    "SentenceSectionizer",
    "find_adapter",
    "isolate_qa_and_sections",
    "load_dataset",
    "load_queries",
    "load_sections",
    "tokenize_corpus",
    "tokenize_queries",
    "transform",
]
