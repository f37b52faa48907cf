"""Hybrid engine composition: dense ∥ sparse ∥ lookup in one XLA program.

Parity: reference `src/vod_search/hybrid_search.py` (fan a query batch to every
named engine) + `vod_dataloaders/core/search.py` `async_hybrid_search` (prepend
the lookup payload, zero-fill lookup scores, min-subtract normalize, weighted
merge). The reference runs engines concurrently via asyncio over HTTP
(`core/search.py:128-146`); here "concurrently" is XLA's problem — all engines are
stages of one jitted program and the compiler overlaps them.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import struct

from vod_tpu.ops.merge import merge_search_results
from vod_tpu.ops.numpy_ops import normalize_scores
from vod_tpu.ops.sample import PrioritySampledSections, sample_search_results
from vod_tpu.types.retrieval import RetrievalBatch
from .base import SearchQueries
from .dense import DenseIndex, IVFIndex, PQIndex, dense_search, ivf_search, pq_search
from .ivfpq import IVFPQIndex, ivfpq_search
from .lookup import lookup_search
from .sharded import (
    ShardedDenseIndex,
    ShardedIVFPQIndex,
    sharded_ivfpq_search,
    ShardedIVFIndex,
    ShardedPQIndex,
    ShardedSparseIndex,
    sharded_dense_search,
    sharded_ivf_search,
    sharded_pq_search,
    sharded_sparse_search,
)
from .sparse import SparseIndex, sparse_search


@struct.dataclass
class HybridEngines:
    """Named engine bundle (parity: `HybridSearchFactoryConfig.engines`)."""

    dense: typ.Optional[
        typ.Union[
            DenseIndex, IVFIndex, IVFPQIndex, PQIndex,
            ShardedDenseIndex, ShardedIVFPQIndex, ShardedPQIndex,
        ]
    ] = None
    sparse: typ.Optional[typ.Union[SparseIndex, ShardedSparseIndex]] = None


def _dense_dispatch(index, queries: SearchQueries, top_k: int) -> RetrievalBatch:
    # Every engine honors its index's `approx_recall` (None = exact top-k), so
    # exactness is reachable from config on the training and serving paths.
    if isinstance(index, ShardedDenseIndex):
        return sharded_dense_search(index, queries, top_k)
    if isinstance(index, ShardedPQIndex):
        return sharded_pq_search(index, queries, top_k)
    if isinstance(index, ShardedIVFPQIndex):
        return sharded_ivfpq_search(index, queries, top_k)
    if isinstance(index, ShardedIVFIndex):
        return sharded_ivf_search(index, queries, top_k)
    if isinstance(index, PQIndex):
        return pq_search(index, queries, top_k)
    if isinstance(index, IVFPQIndex):
        return ivfpq_search(index, queries, top_k)
    if isinstance(index, IVFIndex):
        return ivf_search(index, queries, top_k)
    return dense_search(index, queries, top_k)


def hybrid_search(
    engines: HybridEngines,
    queries: SearchQueries,
    top_k: int,
    weights: typ.Optional[dict[str, jax.Array | float]] = None,
) -> tuple[RetrievalBatch, dict[str, jax.Array]]:
    """Search every engine, normalize, weighted-merge.

    Returns (merged batch sorted by combined score, per-engine raw scores aligned
    to the merged ids). Lookup results ride along with score 0 and labels 1
    (`core/search.py:92-96`); engine scores are min-subtracted per row before the
    weighted sum (`core/normalize.py:6`).
    """
    results: dict[str, RetrievalBatch] = {}
    if queries.section_ids is not None:
        results["lookup"] = lookup_search(queries)
    if engines.dense is not None and queries.vector is not None:
        r = _dense_dispatch(engines.dense, queries, top_k)
        results["dense"] = r.replace(scores=normalize_scores(r.scores))
    if engines.sparse is not None and queries.terms is not None:
        if isinstance(engines.sparse, ShardedSparseIndex):
            r = sharded_sparse_search(engines.sparse, queries, top_k)
        else:
            r = sparse_search(engines.sparse, queries, top_k)
        results["sparse"] = r.replace(scores=normalize_scores(r.scores))
    if not results:
        raise ValueError("No engine matched the provided queries")

    w = {name: 1.0 for name in results}
    if weights:
        w.update({k: v for k, v in weights.items() if k in results})
    merged, raw = merge_search_results(results, w)
    raw.pop("lookup", None)
    return merged, raw


def hybrid_search_and_sample(
    rng: jax.Array,
    engines: HybridEngines,
    queries: SearchQueries,
    *,
    prefetch: int = 100,
    total: int = 8,
    max_pos_sections: int = 2,
    temperature: float = 1.0,
    max_support_size: typ.Optional[int] = None,
    weights: typ.Optional[dict[str, jax.Array | float]] = None,
) -> tuple[PrioritySampledSections, RetrievalBatch]:
    """The full device-side retrieval segment of the collate.

    Parity: `RealmCollate.search` + `sample.sample_search_results`
    (`realm_collate.py:208`, steps `:57-63`) fused into one program:
    search -> normalize -> merge -> labeled priority sampling.
    """
    merged, raw = hybrid_search(engines, queries, prefetch, weights)
    # Truncate to `prefetch`, but positives (gold lookup hits, label > 0) must
    # survive truncation even when their combined score (lookup contributes 0)
    # falls below the engine scores — the reference never drops them because its
    # merge keeps the full dynamic width (`merge.py:159-163`).
    k = min(prefetch, merged.scores.shape[-1])
    if merged.labels is not None:
        key = jnp.where(merged.labels > 0, merged.scores + 1e30, merged.scores)
    else:
        key = merged.scores
    order = jnp.argsort(-key, axis=-1, stable=True)[..., :k]
    merged = RetrievalBatch(
        scores=jnp.take_along_axis(merged.scores, order, axis=-1),
        indices=jnp.take_along_axis(merged.indices, order, axis=-1),
        labels=None if merged.labels is None else jnp.take_along_axis(merged.labels, order, axis=-1),
    )
    raw = {name: jnp.take_along_axis(v, order, axis=-1) for name, v in raw.items()}
    sampled = sample_search_results(
        rng,
        search_results=merged,
        raw_scores=raw,
        total=total,
        max_pos_sections=max_pos_sections,
        temperature=temperature,
        max_support_size=max_support_size,
    )
    return sampled, merged
