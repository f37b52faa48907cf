"""Canonical dataset schemas.

Parity: reference `vod_datasets/rosetta/models.py` — `QueryModel:16` (id, query,
answers + answer_scores, retrieval_ids + retrieval_scores, subset_ids),
`SectionModel:68` (id, content, title, subset_id), `QueryWithContextsModel:89`.
"""

from __future__ import annotations

import typing as typ
import uuid

import pydantic


class QueryModel(pydantic.BaseModel):
    """A canonical query row."""

    id: str = pydantic.Field(default_factory=lambda: uuid.uuid4().hex)
    query: str
    answers: list[str] = pydantic.Field(default_factory=list)
    answer_scores: list[float] = pydantic.Field(default_factory=list)
    retrieval_ids: list[str] = pydantic.Field(default_factory=list)
    retrieval_scores: list[float] = pydantic.Field(default_factory=list)
    subset_ids: list[str] = pydantic.Field(default_factory=list)

    @pydantic.model_validator(mode="after")
    def _check_lengths(self) -> "QueryModel":
        if len(self.answers) != len(self.answer_scores):
            raise ValueError("answers and answer_scores must have equal length")
        if len(self.retrieval_ids) != len(self.retrieval_scores):
            raise ValueError("retrieval_ids and retrieval_scores must have equal length")
        return self


class SectionModel(pydantic.BaseModel):
    """A canonical section (passage) row."""

    id: str
    content: str
    title: typ.Optional[str] = None
    subset_id: typ.Optional[str] = None


class QueryWithContextsModel(QueryModel):
    """A query bundled with its context passages (pre-retrieval datasets)."""

    contexts: list[str]
    titles: typ.Optional[list[str]] = None

    @pydantic.model_validator(mode="after")
    def _check_titles(self) -> "QueryWithContextsModel":
        if self.titles is not None and len(self.titles) != len(self.contexts):
            raise ValueError("titles must match contexts length")
        return self
