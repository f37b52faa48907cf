"""In-batch negatives: flatten per-query sections into one shared section pool.

Parity: reference `vod_dataloaders/core/in_batch_negatives.py:10`
(`flatten_samples`): unique section ids across the batch, padded to the fixed
size B*D so the compiler sees one graph (the reference pads for torch.compile,
`realm_collate.py:126-130`; XLA needs the static shape anyway), with per-query
scores/labels/log-weights gathered onto the shared pool. Every query then scores
against every pooled section — the "in-batch negatives" signal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from vod_tpu.types.retrieval import RetrievalBatch
from .numpy_ops import fill_nans_with_min, gather_values_by_indices
from .sample import PrioritySampledSections


@struct.dataclass
class FlatSampledSections:
    """A shared section pool: ids [U]; per-query channels [B, U]."""

    pool_ids: jax.Array  # [U] int32, -1 padding
    scores: jax.Array  # [B, U]; absent (query, id) pairs get row_min - 1, -inf only at pool padding
    labels: jax.Array  # [B, U] int32 (0 = negative)
    log_weights: jax.Array  # [B, U], -inf where absent
    raw_scores: dict[str, jax.Array]
    lse_pos: jax.Array
    lse_neg: jax.Array
    max_sampling_id: jax.Array


def flatten_samples(samples: PrioritySampledSections) -> FlatSampledSections:
    """jit-compatible flattening (static output width U = B * D)."""
    indices = samples.batch.indices  # [B, D]
    b, d = indices.shape
    u = b * d
    pool = jnp.unique(indices.reshape(-1), size=u, fill_value=-1)
    # unique sorts ascending, so -1 padding lands first; push it to the back
    order = jnp.argsort(pool < 0, stable=True)
    pool = pool[order]

    pool_b = jnp.broadcast_to(pool[None, :], (b, u))
    # (query, id) pairs the query did not retrieve gather as NaN; fill them with
    # row_min - 1 (reference `fill_nans_with_min` semantics) so downstream
    # padding masks (score == -inf) keep them as LIVE in-batch negatives.
    # Only pool padding (-1 ids) stays -inf.
    scores = gather_values_by_indices(pool_b, indices, samples.batch.scores)
    scores = fill_nans_with_min(scores)
    scores = jnp.where(pool_b < 0, -jnp.inf, scores)
    labels = gather_values_by_indices(pool_b, indices, samples.batch.labels, fill_value=0)
    labels = jnp.where(pool_b < 0, 0, labels)
    log_w = gather_values_by_indices(pool_b, indices, samples.log_weights)
    log_w = jnp.where(jnp.isnan(log_w) | (pool_b < 0), -jnp.inf, log_w)
    raw = {
        k: gather_values_by_indices(pool_b, indices, v) for k, v in samples.raw_scores.items()
    }
    return FlatSampledSections(
        pool_ids=pool,
        scores=scores,
        labels=labels,
        log_weights=log_w,
        raw_scores=raw,
        lse_pos=samples.lse_pos,
        lse_neg=samples.lse_neg,
        max_sampling_id=samples.max_sampling_id,
    )
