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


def build_sparse_index_native(
    doc_terms: typ.Sequence[typ.Sequence[int]],
    *,
    n_terms: int,
    max_postings: int = 2048,
    k1: float = 1.2,
    b: float = 0.75,
    subset_ids: typ.Optional[np.ndarray] = None,
    offset: int = 0,
) -> SparseIndex:
    """Impact-index build through the C++ postings builder (python fallback
    inside `native.build_postings` keeps parity when the .so is unavailable).

    O(total tokens) in C++ vs the pure-Python per-token dict loops of
    `build_sparse_index` — the difference between minutes and hours at MSMARCO
    scale (VERDICT r2 #3; parity: ES bulk ingest, `es_search/client.py:335`).
    Output postings are identical to `build_sparse_index` (same BM25 impact
    formula, same impact-ordered truncation); trailing all-empty columns are
    trimmed to match its dynamic width.
    """
    from vod_tpu.native import build_postings

    docs_arr, imp_arr = build_postings(
        doc_terms, n_terms=n_terms, max_postings=max_postings, k1=k1, b=b
    )
    # match build_sparse_index's p_width = min(max_postings, widest term)
    col_used = (docs_arr >= 0).any(axis=0)
    width = int(col_used.sum()) if col_used.any() else 1
    docs_arr, imp_arr = docs_arr[:, :width], imp_arr[:, :width]
    return SparseIndex(
        postings_docs=jnp.asarray(docs_arr),
        postings_impacts=jnp.asarray(imp_arr),
        subset_ids=None if subset_ids is None else jnp.asarray(subset_ids, dtype=jnp.int32),
        n_docs=len(doc_terms),
        offset=offset,
    )


def build_impact_index(
    doc_terms: np.ndarray,  # [N, K] int32 term ids, -1 = padding
    doc_impacts: np.ndarray,  # [N, K] f32 learned impacts (e.g. SPLADE)
    *,
    n_terms: int,
    max_postings: int = 2048,
    subset_ids: typ.Optional[np.ndarray] = None,
    offset: int = 0,
) -> SparseIndex:
    """Invert per-document learned (term, impact) pairs into the impact-ordered
    postings table. This is the learned-sparse (SPLADE) build path: the model's
    impacts replace the BM25 formula, everything downstream (`bm25_topk`,
    sharding, hybrid merge) is shared. Fully vectorized (lexsort + run-rank),
    O(NK log NK) — no per-token Python loops.
    """
    doc_terms = np.asarray(doc_terms, dtype=np.int64)
    doc_impacts = np.asarray(doc_impacts, dtype=np.float32)
    n_docs, k = doc_terms.shape
    flat_t = doc_terms.ravel()
    flat_w = doc_impacts.ravel()
    flat_d = np.repeat(np.arange(n_docs, dtype=np.int32), k)
    keep = (flat_t >= 0) & (flat_t < n_terms) & (flat_w > 0)
    flat_t, flat_w, flat_d = flat_t[keep], flat_w[keep], flat_d[keep]

    # sort by (term asc, impact desc) -> postings rows come out impact-ordered
    order = np.lexsort((-flat_w, flat_t))
    st, sw, sd = flat_t[order], flat_w[order], flat_d[order]

    # rank within each term run = position - run start
    if st.size:
        new_run = np.empty(st.shape, dtype=bool)
        new_run[0] = True
        new_run[1:] = st[1:] != st[:-1]
        run_start = np.maximum.accumulate(np.where(new_run, np.arange(st.size), 0))
        rank = np.arange(st.size) - run_start
        p_width = int(min(max_postings, rank.max() + 1))
    else:
        rank = st.astype(np.int64)
        p_width = 1
    docs_arr = np.full((n_terms, p_width), -1, dtype=np.int32)
    imp_arr = np.zeros((n_terms, p_width), dtype=np.float32)
    trunc = rank < p_width  # impact-ordered truncation, same as the BM25 build
    docs_arr[st[trunc], rank[trunc]] = sd[trunc]
    imp_arr[st[trunc], rank[trunc]] = sw[trunc]

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


def bm25_topk(
    postings_docs: jax.Array,  # [T, P] int32 doc ids (global), -1 padding
    postings_impacts: jax.Array,  # [T, P] f32
    terms: jax.Array,  # [B, L] query term ids
    weights: typ.Optional[jax.Array],  # [B, L] or None
    top_k: int,
    *,
    doc_subset_ids: typ.Optional[jax.Array] = None,  # [N] int32 per-doc subset
    query_subset_ids: typ.Optional[jax.Array] = None,  # [B, S]
) -> tuple[jax.Array, jax.Array]:
    """Term-at-a-time BM25 top-k over one postings table. Returns (scores,
    doc ids) with -inf/-1 padding; doc ids are whatever id space the table
    stores (global ids under sharding). Shared by the unsharded engine and the
    per-shard body of `sharded_sparse_search`."""
    b, l = terms.shape
    t_max, p = postings_docs.shape
    if weights is None:
        weights = jnp.ones_like(terms, jnp.float32)

    term_ok = (terms >= 0) & (terms < t_max)
    safe_terms = jnp.clip(terms, 0, t_max - 1)
    docs = postings_docs[safe_terms]  # [B, L, P]
    imps = postings_impacts[safe_terms] * weights[..., None]
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

    if query_subset_ids is not None and doc_subset_ids is not None:
        safe_d = jnp.clip(sdocs, 0, doc_subset_ids.shape[0] - 1)
        sub = doc_subset_ids[safe_d]  # [B, L*P]
        match = jnp.any(sub[:, :, None] == query_subset_ids[:, None, :], axis=-1)
        no_filter = jnp.all(query_subset_ids < 0, axis=-1, keepdims=True)
        score = jnp.where(match | no_filter, score, -jnp.inf)

    k_eff = min(top_k, score.shape[-1])
    top_s, pos = jax.lax.top_k(score, k_eff)
    top_d = jnp.take_along_axis(sdocs, pos, axis=-1)
    if k_eff < top_k:
        pad = top_k - k_eff
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        top_d = jnp.pad(top_d, ((0, 0), (0, pad)), constant_values=_SENTINEL)
    return top_s, top_d


def sparse_search(
    index: SparseIndex,
    queries: SearchQueries,
    top_k: int,
) -> RetrievalBatch:
    """BM25 scoring of query term-id lists against the impact index."""
    terms = queries.terms
    if terms is None:
        raise ValueError("sparse_search requires queries.terms")
    top_s, top_d = bm25_topk(
        index.postings_docs, index.postings_impacts, terms, queries.term_weights,
        top_k,
        doc_subset_ids=index.subset_ids, query_subset_ids=queries.subset_ids,
    )
    ok = jnp.isfinite(top_s)
    top_d = jnp.where(ok, top_d + index.offset, -1).astype(jnp.int32)
    top_s = jnp.where(ok, top_s, -jnp.inf)
    return RetrievalBatch(scores=top_s, indices=top_d)
