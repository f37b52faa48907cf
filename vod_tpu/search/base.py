"""Search API surface.

Parity: reference `src/vod_search/base.py` — `SearchClient.search(text, vector,
subset_ids, ids, shard, top_k) -> RetrievalBatch` (`base.py:46`). Here the same
contract is a pure jittable function of (index pytree, SearchQueries, top_k);
the `SearchMaster` server-process machinery (`base.py:83-200`) disappears: indexes
are device arrays in HBM, not subprocesses behind HTTP.

String-y inputs (query text, subset-id strings, section-id hashes) are resolved to
integer ids host-side by the dataset layer; on device everything is int32.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SearchQueries:
    """Device-side query batch for any engine combination.

    All fields optional; engines consume what they need:
      vector      [B, D]  dense query embeddings
      terms       [B, L]  int32 query term ids (sparse engine), -1 = padding
      term_weights[B, L]  per-term query weights (e.g. 1.0 or idf-weighted)
      subset_ids  [B, S]  allowed corpus subset ids per query, -1 = padding
                          (parity: ES `terms` filter on `__subset_id__`)
      section_ids [B, G]  gold section row-ids per query for the lookup engine,
                          -1 = padding (parity: the "lookup" payload,
                          `core/search.py:42-50`)
      shard       [B]     target shard index per query for multi-corpus sharding,
                          (parity: `TARGET_SHARD_KEY` routing, `sharded_search.py:176`)
    """

    vector: typ.Optional[jax.Array] = None
    terms: typ.Optional[jax.Array] = None
    term_weights: typ.Optional[jax.Array] = None
    subset_ids: typ.Optional[jax.Array] = None
    section_ids: typ.Optional[jax.Array] = None
    shard: typ.Optional[jax.Array] = None


def subset_mask(
    corpus_subset_ids: jax.Array,  # [N] int32, -1 = no subset
    allowed: typ.Optional[jax.Array],  # [B, S] int32, -1 = padding
) -> typ.Optional[jax.Array]:
    """[B, N] bool — True where the corpus row's subset is allowed for the query.

    A query with no allowed subsets (all -1) matches everything (no filter).
    """
    if allowed is None:
        return None
    match = corpus_subset_ids[None, None, :] == allowed[:, :, None]  # [B, S, N]
    any_match = jnp.any(match, axis=1)  # [B, N]
    no_filter = jnp.all(allowed < 0, axis=-1, keepdims=True)  # [B, 1]
    return any_match | no_filter
