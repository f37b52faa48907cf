"""Lookup engine: fetch gold sections by explicit row id.

Parity: the reference's "lookup" payload — an empty-text query with a `terms`
filter on gold section ids against the sparse engine (`core/search.py:36-50`,
`es_search/client.py:167-193`). Because the TPU build resolves section-id hashes
to global row ids host-side, lookup collapses to an identity: return the ids with
score 0 and label 1 (`_merge_search_results` zero-fills lookup scores,
`core/search.py:92-96`).
"""

from __future__ import annotations

import jax.numpy as jnp

from vod_tpu.types.retrieval import RetrievalBatch
from .base import SearchQueries


def lookup_search(queries: SearchQueries, top_k: int | None = None) -> RetrievalBatch:
    """Return the queries' gold `section_ids` as results with score 0 / label 1."""
    ids = queries.section_ids
    if ids is None:
        raise ValueError("lookup_search requires queries.section_ids")
    if top_k is not None and top_k < ids.shape[-1]:
        ids = ids[..., :top_k]
    valid = ids >= 0
    scores = jnp.where(valid, 0.0, -jnp.inf)
    labels = jnp.where(valid, 1, -1).astype(jnp.int32)
    return RetrievalBatch(scores=scores, indices=ids.astype(jnp.int32), labels=labels)
