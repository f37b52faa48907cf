"""Retrieval benchmarking without a model in the loop.

Parity: reference `vod_ops/workflows/benchmark.py:21` (`benchmark_retrieval`):
spin the hybrid engine + dataloader, compute retrieval metrics per score key
(sparse / dense / combined `score`) against the gold labels — no gradient step.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
import numpy as np

from vod_tpu.models.monitoring import RetrievalMonitor
from vod_tpu.search.base import SearchQueries
from vod_tpu.search.hybrid import HybridEngines, hybrid_search
from .collate import QueryBatch

_SCORE_KEYS = ("score", "sparse", "dense")  # parity: `benchmark.py:17`


def benchmark_retrieval(
    engines: HybridEngines,
    query_batches: typ.Sequence[QueryBatch],
    *,
    query_vectors: typ.Optional[typ.Sequence[jax.Array]] = None,
    top_k: int = 100,
    metrics: typ.Sequence[str] = ("ndcg_10", "mrr_10", "hitrate_3", "recall_50"),
    weights: typ.Optional[dict[str, float]] = None,
    reranker: typ.Optional[typ.Callable[[int, typ.Any], jax.Array]] = None,
) -> dict[str, dict[str, float]]:
    """Run the hybrid engine over query batches; metrics per score key.

    `reranker(batch_index, merged) -> [B, K] scores` adds a second-stage
    score key "rerank" — e.g. a cross-encoder over the merged candidates
    (`models.cross_encoder.cross_encoder_rerank` after host-side
    `tokenize_pairs`) or a MaxSim re-score (`search.maxsim.maxsim_rerank`).
    Beyond reference: upstream benchmarks first-stage scores only.
    """
    keys = _SCORE_KEYS + (("rerank",) if reranker is not None else ())
    monitors = {k: RetrievalMonitor(list(metrics)) for k in keys}

    @jax.jit
    def run(engines, sq):
        return hybrid_search(engines, sq, top_k, weights)

    for bi, qb in enumerate(query_batches):
        sq = SearchQueries(
            vector=None if query_vectors is None else query_vectors[bi],
            terms=qb.terms,
            term_weights=qb.term_weights,
            subset_ids=qb.subset_ids,
            section_ids=qb.section_ids,
            shard=qb.shard,
        )
        merged, raw = run(engines, sq)
        rel = jnp.maximum(merged.labels, 0) if merged.labels is not None else jnp.zeros_like(merged.indices)
        for key in keys:
            if key == "score":
                scores = merged.scores
            elif key == "rerank":
                scores = reranker(bi, merged)
            elif key in raw:
                scores = raw[key]
            else:
                continue
            monitors[key].update(relevances=rel, scores=scores)
    return {k: m.compute() for k, m in monitors.items() if m._state is not None}
