"""Retrieval result containers as JAX pytrees.

Parity: reference `src/vod_types/retrieval.py` — a `RetrievalBatch` is a rectangle of
`(scores, indices, labels)` with the padding conventions `indices = -1`,
`scores = -inf`, `labels = -1` (reference `retrieval.py:270,284-286`).

Design deviation (TPU-first): the reference pads rows dynamically to the longest row
(numba `_write_array`, `retrieval.py:252`); under XLA every shape is static, so all
constructors here take an explicit width `k` and mask instead of re-padding.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

PAD_INDEX: int = -1
PAD_SCORE: float = -np.inf
PAD_LABEL: int = -1

# Sentinel used to push padded ids to the end of an ascending sort.
_ID_SENTINEL = np.iinfo(np.int32).max


@struct.dataclass
class RetrievalBatch:
    """A batch of retrieval results: `[..., k]` scores/indices (+ optional labels).

    Registered as a pytree so it can flow through `jit` / `shard_map` directly
    (the reference registers its torch analogue as a torch pytree, `batch.py:117-129`).
    """

    scores: jax.Array  # float [..., k], padding = -inf
    indices: jax.Array  # int32 [..., k], padding = -1
    labels: typ.Optional[jax.Array] = None  # int32 [..., k], padding = -1
    meta: dict = struct.field(pytree_node=False, default_factory=dict)

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self.scores.shape)

    def __mul__(self, weight: float | jax.Array) -> "RetrievalBatch":
        """Scale finite scores by `weight`; padding stays -inf.

        Parity: reference `RetrievalBatch.__mul__` — but the reference computes
        `-inf * 0 = nan` for a zero weight; here padding is preserved explicitly.
        """
        scaled = jnp.where(jnp.isfinite(self.scores), self.scores * weight, self.scores)
        return self.replace(scores=scaled)

    def __add__(self, other: "RetrievalBatch") -> "RetrievalBatch":
        """Union-merge with another batch, summing scores of shared ids.

        Parity: reference `RetrievalBatch.__add__` (`retrieval.py:203`). Thin
        wrapper over `vod_tpu.ops.merge.merge_search_results`.
        """
        from vod_tpu.ops.merge import merge_search_results

        merged, _ = merge_search_results({"a": self, "b": other})
        return merged

    def sorted(self) -> "RetrievalBatch":
        """Sort by descending score (padding last)."""
        order = jnp.argsort(-self.scores, axis=-1, stable=True)
        return self._permute(order)

    def topk(self, k: int) -> "RetrievalBatch":
        """Keep the top-k entries by score."""
        scores, pos = jax.lax.top_k(self.scores, k)
        indices = jnp.take_along_axis(self.indices, pos, axis=-1)
        labels = None if self.labels is None else jnp.take_along_axis(self.labels, pos, axis=-1)
        return RetrievalBatch(scores=scores, indices=indices, labels=labels, meta=self.meta)

    def _permute(self, order: jax.Array) -> "RetrievalBatch":
        scores = jnp.take_along_axis(self.scores, order, axis=-1)
        indices = jnp.take_along_axis(self.indices, order, axis=-1)
        labels = None if self.labels is None else jnp.take_along_axis(self.labels, order, axis=-1)
        return RetrievalBatch(scores=scores, indices=indices, labels=labels, meta=self.meta)

    def to_numpy(self) -> "RetrievalBatch":
        return RetrievalBatch(
            scores=np.asarray(self.scores),
            indices=np.asarray(self.indices),
            labels=None if self.labels is None else np.asarray(self.labels),
            meta=self.meta,
        )


def stack_samples(samples: typ.Sequence[RetrievalBatch], k: int | None = None) -> RetrievalBatch:
    """Stack 1-d retrieval samples into a rectangular batch of width `k`.

    Parity: reference `stack_samples` (`retrieval.py:235`) which pads to the longest
    row; here the width is `k or max_len` and rows are truncated/padded to it.
    Host-side utility (numpy), not jit-compatible.
    """
    if k is None:
        k = max(int(s.scores.shape[-1]) for s in samples)
    n = len(samples)
    any_labels = any(s.labels is not None for s in samples)
    scores = np.full((n, k), PAD_SCORE, dtype=np.float32)
    indices = np.full((n, k), PAD_INDEX, dtype=np.int32)
    labels = np.full((n, k), PAD_LABEL, dtype=np.int32) if any_labels else None
    for i, s in enumerate(samples):
        w = min(k, int(s.scores.shape[-1]))
        scores[i, :w] = np.asarray(s.scores)[:w]
        indices[i, :w] = np.asarray(s.indices)[:w]
        if any_labels and s.labels is not None:
            labels[i, :w] = np.asarray(s.labels)[:w]
    return RetrievalBatch(scores=scores, indices=indices, labels=labels)
