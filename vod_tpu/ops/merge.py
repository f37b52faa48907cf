"""Weighted union-merge of per-engine search results, in the global index space.

Parity: reference `vod_dataloaders/core/merge.py` — `merge_search_results` takes
`dict[engine_name, RetrievalBatch]` plus per-engine weights, returns one merged
`RetrievalBatch` whose score for a section id is the weighted sum of the scores of
every engine that returned it, plus per-engine raw scores aligned to the merged ids
(NaN where an engine did not return the id) and labels gathered from whichever
engine carries them (fill -1).

Design deviation (TPU-first): the reference's numba kernel does an O(k^2) linear
scan per row (`merge.py:84-105`); here duplicates are collapsed with one stable sort
by id + shifted-comparison segment sums — O(k log k), fully vectorized, and the
output width is the static sum of input widths (callers `topk()` down as needed).
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp

from vod_tpu.types.retrieval import PAD_INDEX, RetrievalBatch

_SENTINEL = jnp.iinfo(jnp.int32).max


def merge_search_results(
    search_results: dict[str, RetrievalBatch],
    weights: typ.Optional[dict[str, jax.Array | float]] = None,
) -> tuple[RetrievalBatch, dict[str, jax.Array]]:
    """Merge engine results by weighted score sum over shared ids.

    Args:
        search_results: engine name -> RetrievalBatch of shape [B, K_e].
        weights: engine name -> scalar weight (may be traced; engine-weight
            schedules enter the XLA program here instead of via `mp.Manager`
            shared dicts as in the reference, `loops/train.py:184`).

    Returns:
        (merged RetrievalBatch [B, sum K_e] sorted by descending score,
         per-engine raw scores aligned to the merged ids, NaN where absent).
    """
    names = list(search_results.keys())
    if weights is None:
        weights = {k: 1.0 for k in names}
    missing = set(names) - set(weights)
    if missing:
        raise ValueError(f"Missing weights for engines: {missing}")

    widths = [int(search_results[n].scores.shape[-1]) for n in names]
    batch_shape = search_results[names[0]].scores.shape[:-1]
    k_tot = sum(widths)
    f32 = search_results[names[0]].scores.dtype

    # Concatenate ids / weighted scores / per-engine raw channels / labels.
    ids = jnp.concatenate([search_results[n].indices.astype(jnp.int32) for n in names], axis=-1)
    wscores = []
    raw_channels: dict[str, list[jax.Array]] = {n: [] for n in names}
    labels_parts = []
    for n in names:
        r = search_results[n]
        w = weights[n]
        ws = jnp.where(jnp.isfinite(r.scores), r.scores * w, -jnp.inf)
        wscores.append(ws)
        for m in names:
            if m == n:
                raw_channels[m].append(r.scores)
            else:
                raw_channels[m].append(jnp.full(r.scores.shape, jnp.nan, dtype=f32))
        if r.labels is not None:
            labels_parts.append(r.labels.astype(jnp.int32))
        else:
            labels_parts.append(jnp.full(r.indices.shape, -1, dtype=jnp.int32))
    wscores = jnp.concatenate(wscores, axis=-1)
    raws = {n: jnp.concatenate(parts, axis=-1) for n, parts in raw_channels.items()}
    labels = jnp.concatenate(labels_parts, axis=-1)
    any_labels = any(search_results[n].labels is not None for n in names)

    # Stable sort by id (padding ids -> sentinel, pushed last).
    sort_ids = jnp.where(ids < 0, _SENTINEL, ids)
    order = jnp.argsort(sort_ids, axis=-1, stable=True)
    sid = jnp.take_along_axis(sort_ids, order, axis=-1)
    ws_s = jnp.take_along_axis(wscores, order, axis=-1)
    raw_s = {n: jnp.take_along_axis(v, order, axis=-1) for n, v in raws.items()}
    lab_s = jnp.take_along_axis(labels, order, axis=-1)

    # Duplicates of an id are now adjacent; an id appears at most len(names) times
    # (once per engine), so a fixed number of shifted comparisons collapses groups.
    def shift_left(x: jax.Array, d: int, fill) -> jax.Array:
        pad = jnp.full(batch_shape + (d,), fill, dtype=x.dtype)
        return jnp.concatenate([x[..., d:], pad], axis=-1)

    first = jnp.concatenate(
        [jnp.ones(batch_shape + (1,), dtype=bool), sid[..., 1:] != sid[..., :-1]], axis=-1
    )
    contrib = jnp.where(jnp.isfinite(ws_s), ws_s, 0.0)
    has_finite = jnp.isfinite(ws_s)
    merged = contrib
    merged_has = has_finite
    lab_merged = lab_s
    raw_merged = dict(raw_s)
    for d in range(1, len(names)):
        same = shift_left(sid, d, _SENTINEL - 1) == sid
        same = same & (sid != _SENTINEL)
        merged = merged + jnp.where(same, shift_left(contrib, d, 0.0), 0.0)
        merged_has = merged_has | (same & shift_left(has_finite, d, False))
        lab_merged = jnp.maximum(lab_merged, jnp.where(same, shift_left(lab_s, d, -1), -1))
        for n in names:
            shifted = shift_left(raw_s[n], d, jnp.nan)
            take = same & jnp.isnan(raw_merged[n]) & ~jnp.isnan(shifted)
            raw_merged[n] = jnp.where(take, shifted, raw_merged[n])

    valid = first & (sid != _SENTINEL)
    out_scores = jnp.where(valid & merged_has, merged, -jnp.inf)
    out_ids = jnp.where(valid, sid, PAD_INDEX).astype(jnp.int32)
    out_labels = jnp.where(valid, lab_merged, -1)
    out_raws = {n: jnp.where(valid, raw_merged[n], jnp.nan) for n in names}

    # Compact: descending score puts real entries first, padding last.
    final_order = jnp.argsort(-out_scores, axis=-1, stable=True)
    out = RetrievalBatch(
        scores=jnp.take_along_axis(out_scores, final_order, axis=-1),
        indices=jnp.take_along_axis(out_ids, final_order, axis=-1),
        labels=jnp.take_along_axis(out_labels, final_order, axis=-1) if any_labels else None,
    )
    out_raws = {n: jnp.take_along_axis(v, final_order, axis=-1) for n, v in out_raws.items()}
    assert out.scores.shape[-1] == k_tot
    return out, out_raws
