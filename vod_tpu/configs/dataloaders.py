"""Dataloader / collate / tokenizer configs.

Parity: reference `vod_configs/dataloaders.py` — `DataLoaderConfig:11`,
`TemplatesConfig:24` (jinja templates for query/section/lm),
`TokenizerConfig:51`, `RealmCollateConfig:107`, `SamplerFactoryConfig:142`.
"""

from __future__ import annotations

import typing as typ

import pydantic

from .base import StrictModel


class TemplatesConfig(StrictModel):
    """Jinja templates rendered before tokenization (parity `dataloaders.py:24`)."""

    query: str = "{{ query }}"
    section: str = "{{ title }} {{ content }}"
    lm: str = "{{ section }} {{ query }} {{ answer }}"


class TokenizerConfig(StrictModel):
    """HF tokenizer instantiation (parity `dataloaders.py:51`)."""

    name_or_path: str = "bert-base-uncased"
    max_length: int = 200
    lm_max_length: int = 512
    use_fast: bool = True

    def instantiate(self) -> typ.Any:
        import transformers

        return transformers.AutoTokenizer.from_pretrained(self.name_or_path, use_fast=self.use_fast)


class RealmCollateConfig(StrictModel):
    """The collate knobs (parity `dataloaders.py:107`)."""

    prefetch_n_sections: int = 100
    n_sections: typ.Optional[int] = 8
    max_pos_sections: typ.Optional[int] = 2
    support_size: typ.Optional[int] = None  # max_support_size truncation
    do_sample: bool = True
    in_batch_negatives: bool = False
    temperature: float = 1.0
    lookup_engine: str = "sparse"


class SamplerFactoryConfig(StrictModel):
    """Weighted query sampler (parity `dataloaders.py:142` + `dl_sampler.py`)."""

    mode: typ.Literal["lookup", "inverse_frequency", "product"] = "lookup"
    key: str = "answer"
    lookup: typ.Optional[dict[str, float]] = None


class DataLoaderConfig(StrictModel):
    batch_size: int = 32
    shuffle: bool = True
    seed: int = 0
    drop_last: bool = True
    num_workers: int = 0  # host-side prefetch threads (not torch workers)
    sampler: typ.Optional[SamplerFactoryConfig] = None
