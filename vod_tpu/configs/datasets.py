"""Dataset configs.

Parity: reference `vod_configs/datasets.py` — `BaseDatasetConfig:65` (identifier,
name_or_path or loader callable, subsets, split, options, content fingerprint),
`QueriesDatasetConfig:131` (`link` -> section shard), `SectionsDatasetConfig:141`
(per-dataset `search` diff). `TARGET_SHARD_KEY` parity: queries carry the name of
their linked section shard (`static.py:1`).
"""

from __future__ import annotations

import typing as typ

import pydantic

from .base import StrictModel

TARGET_SHARD_KEY = "__LINKED_SHARD__"


class DatasetOptionsConfig(StrictModel):
    """Loading options (subset sampling, sectioning; parity `datasets.py:33`)."""

    subset_size: typ.Optional[int] = None
    sectioning: typ.Optional[dict] = None  # see support.SectioningConfig
    seed: int = 0


class BaseDatasetConfig(StrictModel):
    identifier: str
    name_or_path: typ.Union[str, typ.Any] = None  # str path or DatasetLoader callable
    subsets: list[str] = pydantic.Field(default_factory=list)
    split: str = "train"
    options: DatasetOptionsConfig = DatasetOptionsConfig()

    def fingerprint(self) -> str:
        from vod_tpu.utils.fingerprint import fingerprint

        return fingerprint(
            {
                "identifier": self.identifier,
                "name_or_path": str(self.name_or_path),
                "subsets": self.subsets,
                "split": self.split,
                "options": self.options.model_dump(),
            }
        )


class QueriesDatasetConfig(BaseDatasetConfig):
    """Query shard, linked to a section shard by name (parity `datasets.py:131`)."""

    link: typ.Optional[str] = None


class SectionsDatasetConfig(BaseDatasetConfig):
    """Section shard with its own search-engine diff (parity `datasets.py:141`)."""

    search: typ.Optional[dict] = None  # diff over SearchFactoryDefaults
