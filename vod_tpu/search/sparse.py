"""Sparse term-impact (BM25) engine on device.

Parity: replaces Elasticsearch BM25 (reference `src/vod_search/es_search/`).
The analyzer runs offline (host/C++): documents become term-id lists; the build
precomputes BM25 *impact scores* per (term, doc) posting, impact-sorted and
truncated to `max_postings` docs per term (standard impact-ordered index pruning,
bounding the static posting width XLA needs).

Scoring is term-at-a-time entirely on device: gather the postings rows of the
query's terms, flatten, sort by doc id, segment-sum duplicate docs, top-k.
BM25 parameters follow ES defaults (k1=1.2, b=0.75,
idf = ln(1 + (N - df + 0.5)/(df + 0.5))).
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vod_tpu.types.retrieval import RetrievalBatch
from .base import SearchQueries

_SENTINEL = jnp.iinfo(jnp.int32).max


@struct.dataclass
class SparseIndex:
    postings_docs: jax.Array  # [T, P] int32 doc ids, -1 = padding
    postings_impacts: jax.Array  # [T, P] f32 BM25 impacts (impact-sorted desc)
    subset_ids: typ.Optional[jax.Array] = None  # [N] int32
    n_docs: int = struct.field(pytree_node=False, default=0)
    offset: int = struct.field(pytree_node=False, default=0)


def build_sparse_index(
    doc_terms: typ.Sequence[typ.Sequence[int]],
    *,
    n_terms: typ.Optional[int] = None,
    max_postings: int = 2048,
    k1: float = 1.2,
    b: float = 0.75,
    subset_ids: typ.Optional[np.ndarray] = None,
    offset: int = 0,
) -> SparseIndex:
    """Build the impact index host-side from per-document term-id lists."""
    n_docs = len(doc_terms)
    doc_lens = np.asarray([len(t) for t in doc_terms], dtype=np.float32)
    avgdl = max(doc_lens.mean(), 1.0) if n_docs else 1.0

    # term -> {doc: tf}
    df: dict[int, int] = {}
    postings: dict[int, list[tuple[int, int]]] = {}
    for d, terms in enumerate(doc_terms):
        counts: dict[int, int] = {}
        for t in terms:
            counts[t] = counts.get(t, 0) + 1
        for t, tf in counts.items():
            postings.setdefault(t, []).append((d, tf))
            df[t] = df.get(t, 0) + 1

    t_max = (n_terms if n_terms is not None else (max(postings) + 1 if postings else 1))
    p_width = min(max_postings, max((len(v) for v in postings.values()), default=1))
    docs_arr = np.full((t_max, p_width), -1, dtype=np.int32)
    imp_arr = np.zeros((t_max, p_width), dtype=np.float32)
    for t, plist in postings.items():
        if t >= t_max:
            continue
        idf = np.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
        scored = []
        for d, tf in plist:
            norm = tf + k1 * (1.0 - b + b * doc_lens[d] / avgdl)
            scored.append((d, idf * tf * (k1 + 1.0) / norm))
        scored.sort(key=lambda x: -x[1])  # impact-ordered truncation
        for j, (d, imp) in enumerate(scored[:p_width]):
            docs_arr[t, j] = d
            imp_arr[t, j] = imp

    return SparseIndex(
        postings_docs=jnp.asarray(docs_arr),
        postings_impacts=jnp.asarray(imp_arr),
        subset_ids=None if subset_ids is None else jnp.asarray(subset_ids, dtype=jnp.int32),
        n_docs=n_docs,
        offset=offset,
    )


def _segment_sum_sorted(ids: jax.Array, vals: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row: sum `vals` over runs of equal (sorted) `ids`.

    Returns (totals at first-of-run positions, first-of-run mask); other positions
    hold junk. ids must be ascending per row; sentinel ids allowed.
    """
    first = jnp.concatenate(
        [jnp.ones(ids.shape[:-1] + (1,), dtype=bool), ids[..., 1:] != ids[..., :-1]], axis=-1
    )
    seg = jnp.cumsum(first.astype(jnp.int32), axis=-1) - 1  # dense run numbering

    def row(seg_i: jax.Array, val_i: jax.Array) -> jax.Array:
        return jax.ops.segment_sum(val_i, seg_i, num_segments=val_i.shape[-1])

    totals_per_seg = jax.vmap(row)(seg.reshape(-1, seg.shape[-1]), vals.reshape(-1, vals.shape[-1]))
    totals_per_seg = totals_per_seg.reshape(vals.shape)
    totals = jnp.take_along_axis(totals_per_seg, seg, axis=-1)
    return totals, first


def sparse_search(
    index: SparseIndex,
    queries: SearchQueries,
    top_k: int,
) -> RetrievalBatch:
    """BM25 scoring of query term-id lists against the impact index."""
    terms = queries.terms
    if terms is None:
        raise ValueError("sparse_search requires queries.terms")
    b, l = terms.shape
    t_max, p = index.postings_docs.shape
    weights = queries.term_weights if queries.term_weights is not None else jnp.ones_like(terms, jnp.float32)

    term_ok = (terms >= 0) & (terms < t_max)
    safe_terms = jnp.clip(terms, 0, t_max - 1)
    docs = index.postings_docs[safe_terms]  # [B, L, P]
    imps = index.postings_impacts[safe_terms] * weights[..., None]
    valid = term_ok[..., None] & (docs >= 0)
    docs = jnp.where(valid, docs, _SENTINEL)
    imps = jnp.where(valid, imps, 0.0)

    flat_docs = docs.reshape(b, l * p)
    flat_imps = imps.reshape(b, l * p)
    order = jnp.argsort(flat_docs, axis=-1, stable=True)
    sdocs = jnp.take_along_axis(flat_docs, order, axis=-1)
    simps = jnp.take_along_axis(flat_imps, order, axis=-1)

    totals, first = _segment_sum_sorted(sdocs, simps)
    score = jnp.where(first & (sdocs != _SENTINEL), totals, -jnp.inf)

    if queries.subset_ids is not None and index.subset_ids is not None:
        safe_d = jnp.clip(sdocs, 0, index.subset_ids.shape[0] - 1)
        sub = index.subset_ids[safe_d]  # [B, L*P]
        match = jnp.any(sub[:, :, None] == queries.subset_ids[:, None, :], axis=-1)
        no_filter = jnp.all(queries.subset_ids < 0, axis=-1, keepdims=True)
        score = jnp.where(match | no_filter, score, -jnp.inf)

    top_s, pos = jax.lax.top_k(score, top_k)
    top_d = jnp.take_along_axis(sdocs, pos, axis=-1)
    ok = jnp.isfinite(top_s)
    top_d = jnp.where(ok, top_d + index.offset, -1).astype(jnp.int32)
    top_s = jnp.where(ok, top_s, -jnp.inf)
    return RetrievalBatch(scores=top_s, indices=top_d)
