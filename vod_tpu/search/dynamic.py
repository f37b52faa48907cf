"""Dynamic (incremental) dense index: add / delete / upsert without rebuilds.

Parity: the reference gets mutability for free from its external engines —
Elasticsearch bulk ingestion (`es_search/client.py:335` `maybe_ingest_data`),
Qdrant upsert (`qdrant_search/client.py:430` `_ingest_data`), faiss
`index.add` (`faiss_search/build.py:51-81` chunked add). The device indexes in
`search/dense.py` are immutable snapshots (rebuilt per training period); this
module adds the ES/Qdrant-style mutable point store the TPU way:

  * **capacity-padded arrays, traced fill level** — XLA needs static shapes,
    so the store is allocated at a fixed capacity and `n_active` (a traced
    scalar) tracks the high-water mark; every op is jittable and in-place
    under buffer donation (no recompiles per update).
  * **explicit point ids** — rows carry their global id (`ids[C]`, qdrant
    point-id semantics) instead of deriving id = row + offset, so deletes,
    upserts and compaction never invalidate ids handed out earlier.
  * **tombstone deletes + compaction** — `dynamic_delete` flips an `alive`
    bit (O(1) HBM traffic); `dynamic_compact` stable-partitions live rows to
    the front (ids preserved) to reclaim slots.
  * **scatter-with-drop writes** — adds write through `.at[pos].set(...,
    mode='drop')` with out-of-capacity positions mapped out of bounds, so an
    overflowing add degrades to "rows dropped + count reported" instead of
    clobbering live data.

Scoring reuses the flat-scan machinery (`_scan_topk`, masked to live rows) and
the int8-MXU path with a scale FROZEN at init (new rows quantize with the same
scale; re-freeze by rebuilding — same trade faiss SQ8 makes).
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import struct

from vod_tpu.ops import pq as pq_ops
from vod_tpu.types.retrieval import RetrievalBatch
from .base import SearchQueries
from .dense import _scan_topk


@struct.dataclass
class DynamicDenseIndex:
    vectors: jax.Array  # [C, D] f32/bf16, or int8 codes (frozen scale)
    ids: jax.Array  # [C] int32 global point ids, -1 = empty slot
    alive: jax.Array  # [C] bool
    subset_ids: jax.Array  # [C] int32, -1 = none
    n_active: jax.Array  # [] int32 high-water mark (slots ever written)
    next_id: jax.Array  # [] int32 auto-assigned id counter
    scale: typ.Optional[jax.Array] = None  # [1, D] f32 when int8
    capacity: int = struct.field(pytree_node=False, default=0)
    approx_recall: typ.Optional[float] = struct.field(pytree_node=False, default=0.95)

    @property
    def n_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))


def dynamic_index_init(
    capacity: int,
    dim: int,
    *,
    dtype: str = "bfloat16",
    scale: typ.Optional[jax.Array] = None,
    start_id: int = 0,
    approx_recall: typ.Optional[float] = 0.95,
) -> DynamicDenseIndex:
    """Empty store. dtype 'int8' requires `scale` ([1, D] f32, e.g. from
    `ops.pq.quantize_int8` on a representative sample) — it is frozen for the
    store's lifetime."""
    capacity = -(-capacity // 128) * 128  # MXU-friendly row padding
    if dtype == "int8":
        if scale is None:
            raise ValueError("int8 dynamic index requires a frozen quantization scale")
        vectors = jnp.zeros((capacity, dim), jnp.int8)
    else:
        vectors = jnp.zeros((capacity, dim), jnp.dtype(dtype))
        scale = None
    return DynamicDenseIndex(
        vectors=vectors,
        ids=jnp.full((capacity,), -1, jnp.int32),
        alive=jnp.zeros((capacity,), bool),
        subset_ids=jnp.full((capacity,), -1, jnp.int32),
        n_active=jnp.zeros((), jnp.int32),
        next_id=jnp.asarray(start_id, jnp.int32),
        scale=scale,
        capacity=capacity,
        approx_recall=approx_recall,
    )


def dynamic_from_dense(
    vectors: jax.Array,
    capacity: int,
    *,
    dtype: str = "bfloat16",
    subset_ids: typ.Optional[jax.Array] = None,
    start_id: int = 0,
    approx_recall: typ.Optional[float] = 0.95,
) -> DynamicDenseIndex:
    """Bootstrap a mutable store from an initial corpus (ids = start_id + row;
    int8 scale frozen from THIS corpus)."""
    scale = None
    if dtype == "int8":
        _, scale = pq_ops.quantize_int8(vectors.astype(jnp.float32), axis=0)
    index = dynamic_index_init(
        capacity, vectors.shape[-1], dtype=dtype, scale=scale,
        start_id=start_id, approx_recall=approx_recall,
    )
    index, _ = dynamic_add(index, vectors, subset_ids=subset_ids)
    return index


def _encode_rows(index: DynamicDenseIndex, vectors: jax.Array) -> jax.Array:
    if index.scale is not None:
        q = vectors.astype(jnp.float32) / jnp.maximum(index.scale, 1e-12)
        return jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)
    return vectors.astype(index.vectors.dtype)


def dynamic_add(
    index: DynamicDenseIndex,
    vectors: jax.Array,  # [M, D]
    *,
    ids: typ.Optional[jax.Array] = None,  # [M] int32; None = auto-assign
    subset_ids: typ.Optional[jax.Array] = None,  # [M] int32
    count: typ.Optional[jax.Array] = None,  # valid rows (<= M); None = all M
) -> tuple[DynamicDenseIndex, jax.Array]:
    """Append `count` rows (jittable; M static, count traced). Returns
    (new index, assigned ids [M] — -1 where the row was invalid or dropped
    for capacity). Rows beyond capacity are DROPPED, never clobber live data
    (parity: ES ingest is append-only; overflow is the caller's signal to
    compact or grow)."""
    m = vectors.shape[0]
    c = index.capacity
    n_valid = jnp.asarray(m, jnp.int32) if count is None else jnp.asarray(count, jnp.int32)
    lane = jnp.arange(m, dtype=jnp.int32)
    valid = lane < n_valid
    pos = index.n_active + lane  # target slots
    ok = valid & (pos < c)
    # out-of-bounds position -> scatter mode='drop' discards the write
    wpos = jnp.where(ok, pos, c)

    new_ids = (
        jnp.asarray(ids, jnp.int32) if ids is not None else index.next_id + lane
    )
    assigned = jnp.where(ok, new_ids, -1)
    rows = _encode_rows(index, vectors)
    sub = (
        jnp.asarray(subset_ids, jnp.int32)
        if subset_ids is not None
        else jnp.full((m,), -1, jnp.int32)
    )

    n_written = jnp.sum(ok.astype(jnp.int32))
    return (
        index.replace(
            vectors=index.vectors.at[wpos].set(rows, mode="drop"),
            ids=index.ids.at[wpos].set(assigned, mode="drop"),
            alive=index.alive.at[wpos].set(True, mode="drop"),
            subset_ids=index.subset_ids.at[wpos].set(sub, mode="drop"),
            n_active=index.n_active + n_written,
            next_id=index.next_id
            + (jnp.asarray(0, jnp.int32) if ids is not None else jnp.sum(valid.astype(jnp.int32))),
        ),
        assigned,
    )


def dynamic_delete(index: DynamicDenseIndex, ids: jax.Array) -> DynamicDenseIndex:
    """Tombstone the given point ids ([K] int32, -1 = padding). Unknown ids are
    ignored (qdrant delete semantics)."""
    ids = jnp.asarray(ids, jnp.int32)
    hit = (index.ids[None, :] == ids[:, None]) & (ids[:, None] >= 0)  # [K, C]
    return index.replace(alive=index.alive & ~jnp.any(hit, axis=0))


def dynamic_update(
    index: DynamicDenseIndex,
    ids: jax.Array,  # [K] int32 (-1 = padding)
    vectors: jax.Array,  # [K, D]
    *,
    subset_ids: typ.Optional[jax.Array] = None,
) -> tuple[DynamicDenseIndex, jax.Array]:
    """Overwrite existing points in place by id (qdrant upsert-on-existing).
    Returns (index, found mask [K]); missing ids are ignored — insert them
    with `dynamic_add`."""
    ids = jnp.asarray(ids, jnp.int32)
    match = (index.ids[None, :] == ids[:, None]) & (ids[:, None] >= 0) & index.alive[None, :]
    found = jnp.any(match, axis=-1)
    pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
    wpos = jnp.where(found, pos, index.capacity)  # drop missing
    rows = _encode_rows(index, vectors)
    out = index.replace(vectors=index.vectors.at[wpos].set(rows, mode="drop"))
    if subset_ids is not None:
        out = out.replace(
            subset_ids=out.subset_ids.at[wpos].set(jnp.asarray(subset_ids, jnp.int32), mode="drop")
        )
    return out, found


def dynamic_compact(index: DynamicDenseIndex) -> DynamicDenseIndex:
    """Stable-partition live rows to the front, reclaiming tombstoned slots.
    Point ids are preserved (searches before/after agree); O(C log C) sort."""
    order = jnp.argsort(~index.alive, stable=True)  # alive (False) first
    return index.replace(
        vectors=index.vectors[order],
        ids=index.ids[order],
        alive=index.alive[order],
        subset_ids=index.subset_ids[order],
        n_active=index.n_alive,
    )


def dynamic_search(
    index: DynamicDenseIndex,
    queries: SearchQueries,
    top_k: int,
    *,
    chunk: int = 131072,
) -> RetrievalBatch:
    """Masked exhaustive MIPS over the live rows; returns point IDS (not row
    positions) with the usual -inf/-1 padding. Composable with hybrid/lookup
    merging like any engine."""
    q = queries.vector
    if q is None:
        raise ValueError("dynamic_search requires queries.vector")
    b, _ = q.shape
    n = index.capacity
    chunk = min(chunk, n)
    while n % chunk != 0:
        chunk -= 128
    allowed = queries.subset_ids

    if index.scale is not None:
        q_f = q.astype(jnp.float32) * index.scale
        q_absmax = jnp.max(jnp.abs(q_f), axis=-1, keepdims=True)
        q_row_scale = jnp.maximum(q_absmax, 1e-8) / 127.0
        q_i8 = jnp.clip(jnp.round(q_f / q_row_scale), -127, 127).astype(jnp.int8)
    else:
        q_eff = q.astype(index.vectors.dtype)

    def score_chunk(start: jax.Array) -> jax.Array:
        v = jax.lax.dynamic_slice_in_dim(index.vectors, start, chunk, axis=0)
        if index.scale is not None:
            acc = jax.lax.dot_general(
                q_i8, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            s = acc.astype(jnp.float32) * q_row_scale
        else:
            s = jnp.dot(q_eff, v.T.astype(q_eff.dtype), preferred_element_type=jnp.float32)
        live = jax.lax.dynamic_slice_in_dim(index.alive, start, chunk, axis=0)
        s = jnp.where(live[None, :], s, -jnp.inf)
        if allowed is not None:
            sub = jax.lax.dynamic_slice_in_dim(index.subset_ids, start, chunk, axis=0)
            match = sub[None, None, :] == allowed[:, :, None]
            ok = jnp.any(match, axis=1) | jnp.all(allowed < 0, axis=-1, keepdims=True)
            s = jnp.where(ok, s, -jnp.inf)
        return s

    top_s, top_pos = _scan_topk(
        score_chunk, n, n, b, top_k, chunk, approx_recall=index.approx_recall
    )
    ok = jnp.isfinite(top_s)
    top_ids = jnp.where(ok, index.ids[jnp.clip(top_pos, 0, n - 1)], -1)
    return RetrievalBatch(scores=jnp.where(ok, top_s, -jnp.inf), indices=top_ids)
