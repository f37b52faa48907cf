"""Device-side collate: from sampled section ids to a full RealmBatch, on-chip.

Parity: reference `RealmCollate.__call__` (`realm_collate.py:102`, steps at
`:57-63`): search -> sample -> fetch section content -> render templates ->
tokenize -> assemble. The reference does content-fetch + jinja + tokenization in
CPU dataloader workers per batch; HERE the tokenized corpus is resident in HBM
(`DeviceCorpus`), so "fetch + template + tokenize" collapses into device gathers
and concatenations — the entire collate fuses into the train step's XLA program
(zero host round-trips; the north star's "retrieval scores flow into REALM
gradients without host round-trips").

Template parity: the reference renders jinja templates into token sequences;
pre-tokenizing the corpus once (host-side, see vod_tpu/data) and concatenating
token segments on device expresses the same `{context} {question} {answer}`
structure with token_type_ids 0/1/2 (`batch.py:77`).
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import struct

from vod_tpu.ops.numpy_ops import replace_negative_indices
from vod_tpu.ops.sample import PrioritySampledSections
from vod_tpu.search.base import SearchQueries
from vod_tpu.search.hybrid import HybridEngines, hybrid_search_and_sample
from vod_tpu.types.batch import RealmBatch


@struct.dataclass
class DeviceCorpus:
    """Tokenized sections resident in HBM (the device side of the dataset)."""

    input_ids: jax.Array  # [N, Ls] int32
    attention_mask: jax.Array  # [N, Ls] int32
    subset_ids: typ.Optional[jax.Array] = None  # [N] int32

    @property
    def size(self) -> int:
        return self.input_ids.shape[0]


@struct.dataclass
class QueryBatch:
    """Host-tokenized query-side batch (one per training step)."""

    input_ids: jax.Array  # [B, Lq]
    attention_mask: jax.Array  # [B, Lq]
    section_ids: typ.Optional[jax.Array] = None  # [B, G] gold ids
    subset_ids: typ.Optional[jax.Array] = None  # [B, S]
    terms: typ.Optional[jax.Array] = None  # [B, L] sparse query terms
    term_weights: typ.Optional[jax.Array] = None
    shard: typ.Optional[jax.Array] = None
    answer_ids: typ.Optional[jax.Array] = None  # [B, La] tokenized answer (for the reader)
    answer_mask: typ.Optional[jax.Array] = None


def build_lm_inputs(
    section_ids: jax.Array,  # [B, D, Ls]
    section_mask: jax.Array,
    query_ids: jax.Array,  # [B, Lq]
    query_mask: jax.Array,
    answer_ids: typ.Optional[jax.Array],  # [B, La]
    answer_mask: typ.Optional[jax.Array],
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Concatenate [context; question; answer] token segments per (query, section).

    Returns (input_ids [B, D, L], attention_mask, token_type_ids with 0/1/2 =
    context/question/answer — parity: `lm__token_type_ids`, `batch.py:77`).
    """
    b, d, ls = section_ids.shape
    q = jnp.broadcast_to(query_ids[:, None, :], (b, d, query_ids.shape[-1]))
    qm = jnp.broadcast_to(query_mask[:, None, :], (b, d, query_mask.shape[-1]))
    parts_ids = [section_ids, q]
    parts_mask = [section_mask, qm]
    parts_tt = [jnp.zeros_like(section_mask), jnp.ones_like(qm)]
    if answer_ids is not None:
        a = jnp.broadcast_to(answer_ids[:, None, :], (b, d, answer_ids.shape[-1]))
        am = jnp.broadcast_to(answer_mask[:, None, :], (b, d, answer_mask.shape[-1]))
        parts_ids.append(a)
        parts_mask.append(am)
        parts_tt.append(jnp.full_like(am, 2))
    ids = jnp.concatenate(parts_ids, axis=-1)
    mask = jnp.concatenate(parts_mask, axis=-1)
    tt = jnp.concatenate(parts_tt, axis=-1)
    return ids, mask * (ids >= 0), jnp.where(mask > 0, tt, 0)


def device_collate(
    rng: jax.Array,
    engines: HybridEngines,
    corpus: DeviceCorpus,
    queries: QueryBatch,
    *,
    query_vectors: typ.Optional[jax.Array] = None,
    prefetch: int = 100,
    n_sections: int = 8,
    max_pos_sections: int = 2,
    temperature: float = 1.0,
    max_support_size: typ.Optional[int] = None,
    weights: typ.Optional[dict[str, jax.Array | float]] = None,
    with_lm: bool = False,
    in_batch_negatives: bool = False,
) -> tuple[RealmBatch, PrioritySampledSections]:
    """search -> merge -> sample -> gather section tokens -> RealmBatch, fused."""
    rng_sample, rng_fill = jax.random.split(rng)
    sq = SearchQueries(
        vector=query_vectors,
        terms=queries.terms,
        term_weights=queries.term_weights,
        subset_ids=queries.subset_ids,
        section_ids=queries.section_ids,
        shard=queries.shard,
    )
    sampled, _merged = hybrid_search_and_sample(
        rng_sample,
        engines,
        sq,
        prefetch=prefetch,
        total=n_sections,
        max_pos_sections=max_pos_sections,
        temperature=temperature,
        max_support_size=max_support_size,
        weights=weights,
    )
    if in_batch_negatives:
        # shared unique section pool; every query scores against all of it
        # (parity: `flatten_samples`, `in_batch_negatives.py:10`)
        from vod_tpu.ops.in_batch_negatives import flatten_samples

        flat = flatten_samples(sampled)
        pool_idx = replace_negative_indices(flat.pool_ids, corpus.size, rng_fill)  # [U]
        sec_ids = corpus.input_ids[pool_idx]  # [U, Ls]
        sec_mask = corpus.attention_mask[pool_idx]
        b = queries.input_ids.shape[0]
        u = pool_idx.shape[0]
        nan = jnp.full((b, u), jnp.nan, dtype=jnp.float32)
        kw: dict[str, typ.Any] = {}
        if with_lm:
            lm_ids, lm_mask, lm_tt = build_lm_inputs(
                jnp.broadcast_to(sec_ids[None], (b, u, sec_ids.shape[-1])),
                jnp.broadcast_to(sec_mask[None], (b, u, sec_mask.shape[-1])),
                queries.input_ids, queries.attention_mask,
                queries.answer_ids, queries.answer_mask,
            )
            kw = {"lm__input_ids": lm_ids, "lm__attention_mask": lm_mask, "lm__token_type_ids": lm_tt}
        batch = RealmBatch(
            query__input_ids=queries.input_ids,
            query__attention_mask=queries.attention_mask,
            section__input_ids=sec_ids,
            section__attention_mask=sec_mask,
            section__relevance=jnp.maximum(flat.labels, 0).astype(jnp.float32),
            section__idx=jnp.broadcast_to(pool_idx[None], (b, u)),
            section__score=flat.scores,
            section__sparse=flat.raw_scores.get("sparse", nan),
            section__dense=flat.raw_scores.get("dense", nan),
            section__log_weight=flat.log_weights,
            section__lse_pos=flat.lse_pos,
            section__lse_neg=flat.lse_neg,
            extras={"flat_sections": True},
            **kw,
        )
        return batch, sampled

    # padding slots fetch a random real section; their scores stay -inf so they
    # never contribute (parity: `replace_negative_indices_`, `realm_collate.py:135`)
    flat_idx = replace_negative_indices(sampled.batch.indices, corpus.size, rng_fill)
    sec_ids = corpus.input_ids[flat_idx]  # [B, D, Ls]
    sec_mask = corpus.attention_mask[flat_idx]

    b, d = sampled.batch.indices.shape
    raw = sampled.raw_scores
    nan = jnp.full((b, d), jnp.nan, dtype=jnp.float32)
    kw: dict[str, typ.Any] = {}
    if with_lm:
        lm_ids, lm_mask, lm_tt = build_lm_inputs(
            sec_ids, sec_mask, queries.input_ids, queries.attention_mask,
            queries.answer_ids, queries.answer_mask,
        )
        kw = {"lm__input_ids": lm_ids, "lm__attention_mask": lm_mask, "lm__token_type_ids": lm_tt}

    batch = RealmBatch(
        query__input_ids=queries.input_ids,
        query__attention_mask=queries.attention_mask,
        section__input_ids=sec_ids.reshape(b * d, -1),
        section__attention_mask=sec_mask.reshape(b * d, -1),
        section__relevance=jnp.maximum(sampled.batch.labels, 0).astype(jnp.float32),
        section__idx=flat_idx,
        section__score=sampled.batch.scores,
        section__sparse=raw.get("sparse", nan),
        section__dense=raw.get("dense", nan),
        section__log_weight=sampled.log_weights,
        section__lse_pos=sampled.lse_pos,
        section__lse_neg=sampled.lse_neg,
        **kw,
    )
    return batch, sampled
