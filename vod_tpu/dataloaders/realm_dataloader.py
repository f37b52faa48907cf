"""RealmDataloader: iterate query shards as device-ready QueryBatches.

Parity: reference `vod_dataloaders/realm_dataloader.py:26` (`RealmDataloader.
factory`: validate query-shard links against the search engines, augment rows
with shard routing + cached vectors, concatenate datasets, install the collate
and sampler). Here the heavy collate runs on device; this host loader only
shuffles/samples rows, tokenizes queries (once per epoch batch), and resolves
gold/section/subset ids to integer rows.
"""

from __future__ import annotations

import typing as typ

import jax.numpy as jnp
import numpy as np

from vod_tpu.configs.dataloaders import DataLoaderConfig, TemplatesConfig
from vod_tpu.runtime.collate import QueryBatch
from .samplers import dl_sampler_factory


class RealmDataloader:
    """Yields `QueryBatch`es from one or more canonical query shards."""

    def __init__(
        self,
        queries: typ.Sequence[typ.Mapping[str, typ.Any]],
        tokenizer: typ.Any,
        *,
        config: typ.Optional[DataLoaderConfig] = None,
        templates: typ.Optional[TemplatesConfig] = None,
        id_map: typ.Optional[dict[str, int]] = None,
        subset_id_map: typ.Optional[dict[str, int]] = None,
        shard_map: typ.Optional[dict[str, int]] = None,  # linked-shard name -> shard idx
        max_length: int = 200,
        answer_max_length: int = 64,
        max_gold: int = 4,
        max_subsets: int = 4,
        with_answers: bool = False,
        with_sparse_terms: bool = False,
        sparse_vocab_size: int = 1 << 18,
        sparse_language: str | None = None,
        sparse_stem: bool = False,
    ):
        self.rows = list(queries)
        self.tokenizer = tokenizer
        self.config = config or DataLoaderConfig()
        self.templates = templates or TemplatesConfig()
        self.id_map = id_map
        self.subset_id_map = subset_id_map
        self.shard_map = shard_map
        self.max_length = max_length
        self.answer_max_length = answer_max_length
        self.max_gold = max_gold
        self.max_subsets = max_subsets
        self.with_answers = with_answers
        self.with_sparse_terms = with_sparse_terms
        self.sparse_vocab_size = sparse_vocab_size
        self.sparse_language = sparse_language
        self.sparse_stem = sparse_stem
        self._probs = None
        if self.config.sampler is not None:
            self._probs = dl_sampler_factory(self.config.sampler)(self.rows)

    def __len__(self) -> int:
        return len(self.rows) // self.config.batch_size

    def _order(self, rng: np.random.Generator) -> np.ndarray:
        n = len(self.rows)
        if self._probs is not None:
            return rng.choice(n, size=n, replace=True, p=self._probs)
        if self.config.shuffle:
            return rng.permutation(n)
        return np.arange(n)

    def _make_batch(self, idx: np.ndarray) -> QueryBatch:
        from vod_tpu.data.corpus import tokenize_queries

        rows = [self.rows[i] for i in idx]
        enc = tokenize_queries(
            rows,
            self.tokenizer,
            max_length=self.max_length,
            answer_max_length=self.answer_max_length,
            templates=self.templates,
            id_map=self.id_map,
            subset_id_map=self.subset_id_map,
            max_gold=self.max_gold,
            max_subsets=self.max_subsets,
            with_answers=self.with_answers,
            with_sparse_terms=self.with_sparse_terms,
            sparse_vocab_size=self.sparse_vocab_size,
            sparse_language=self.sparse_language,
            sparse_stem=self.sparse_stem,
        )
        shard = None
        if self.shard_map is not None:
            shard = jnp.asarray(
                [self.shard_map.get(str(r.get("__LINKED_SHARD__", "")), -1) for r in rows],
                dtype=jnp.int32,
            )
        return QueryBatch(
            input_ids=jnp.asarray(enc["input_ids"]),
            attention_mask=jnp.asarray(enc["attention_mask"]),
            section_ids=jnp.asarray(enc["section_ids"]),
            subset_ids=jnp.asarray(enc["subset_ids"]),
            terms=jnp.asarray(enc["terms"]) if "terms" in enc else None,
            shard=shard,
            answer_ids=jnp.asarray(enc["answer_ids"]) if "answer_ids" in enc else None,
            answer_mask=jnp.asarray(enc["answer_mask"]) if "answer_mask" in enc else None,
        )

    def epoch(self, seed: int = 0) -> typ.Iterator[QueryBatch]:
        """One epoch of batches (drop_last semantics)."""
        rng = np.random.default_rng(seed)
        order = self._order(rng)
        bs = self.config.batch_size
        n_full = len(order) // bs
        for i in range(n_full):
            yield self._make_batch(order[i * bs : (i + 1) * bs])

    def forever(self, seed: int = 0) -> typ.Iterator[QueryBatch]:
        """Infinite stream cycling epochs with fresh shuffles."""
        e = 0
        while True:
            yield from self.epoch(seed + e)
            e += 1
