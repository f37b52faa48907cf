"""Late-interaction (multi-vector / ColBERT MaxSim) reranking engine.

Beyond-reference extension: the reference scores query-vs-section with single
pooled vectors only (`vod_encoder/modeling.py` pools to one embedding). Late
interaction keeps one embedding PER TOKEN and scores

    maxsim(q, d) = sum_i  max_j  <q_i, d_j>

which preserves term-level matching that pooling destroys (the standard
two-stage recipe: a pooled first-stage index proposes candidates, MaxSim
re-ranks them — the IO-aware fused-kernel framing follows the retrieved
FLASH-MAXSIM paper, PAPERS.md).

TPU-first design: token matrices are static `[N, Lt, R]` rectangles with a
validity mask (no ragged docs), stored int8 (per-dim symmetric scale) so the
candidate gather moves R bytes/token and the `[Lq, Lt]` interaction matrix is
an int8 MXU matmul per (query, candidate). Everything jits; the rerank is a
drop-in second stage over ANY first-stage engine (flat/int8/PQ/IVF-PQ,
sharded or not) — compose via `maxsim_search`.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .base import SearchQueries
from vod_tpu.types.retrieval import RetrievalBatch


@struct.dataclass
class MaxSimIndex:
    """Token-level embedding store in the original row-id space."""

    token_codes: jax.Array  # [N, Lt, R] int8 (or f32/bf16 when scale is None)
    token_mask: jax.Array  # [N, Lt] bool — True = real token
    scale: typ.Optional[jax.Array] = None  # [1, R] f32 for the int8 codec
    proj: typ.Optional[jax.Array] = None  # [D, R] truncated-PCA (None = identity)
    n_real: int = struct.field(pytree_node=False, default=0)
    offset: int = struct.field(pytree_node=False, default=0)


def build_maxsim_index(
    token_embeddings: jax.Array,  # [N, Lt, D] f32
    token_mask: jax.Array,  # [N, Lt] bool/int
    *,
    codec: str = "int8",
    proj_dim: typ.Optional[int] = None,
    train_size: int = 262_144,
    offset: int = 0,
) -> MaxSimIndex:
    """Quantize per-token embeddings into a MaxSim store.

    `proj_dim` projects tokens onto the top PCA directions first (same
    truncated-refine trick as the dense engines — token embeddings concentrate
    even harder than pooled ones). Masked token slots are zeroed so they can
    never win a max against a real token.
    """
    from vod_tpu.ops import pq as pq_ops

    n, lt, d = token_embeddings.shape
    x = token_embeddings.astype(jnp.float32)
    mask = token_mask.astype(bool)
    proj = None
    if proj_dim is not None and proj_dim < d:
        flat = x.reshape(n * lt, d)
        keep = mask.reshape(n * lt)
        # PCA on a sample of REAL tokens (padding rows would bias the basis)
        sample = flat[jnp.argsort(~keep)[: min(train_size, n * lt)]]
        proj, _mean = pq_ops.train_projection(sample, proj_dim)
        x = x @ proj
    x = jnp.where(mask[..., None], x, 0.0)
    if codec == "int8":
        absmax = jnp.max(jnp.abs(x.reshape(-1, x.shape[-1])), axis=0, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        codes = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        return MaxSimIndex(
            token_codes=codes, token_mask=mask, scale=scale, proj=proj,
            n_real=n, offset=offset,
        )
    if codec in ("bfloat16", "float32"):
        return MaxSimIndex(
            token_codes=x.astype(jnp.dtype(codec)), token_mask=mask, scale=None,
            proj=proj, n_real=n, offset=offset,
        )
    raise ValueError(f"unknown maxsim codec {codec!r}")


def maxsim_rerank(
    index: MaxSimIndex,
    query_tokens: jax.Array,  # [B, Lq, D] f32
    query_mask: jax.Array,  # [B, Lq] bool/int
    candidate_ids: jax.Array,  # [B, C] int32 row ids (−1 = padding)
) -> jax.Array:
    """MaxSim scores `[B, C]` of each candidate; `-inf` for `-1` padding.

    int8 path: the per-dim codec scale folds into row-quantized query tokens so
    the `[Lq, Lt]` interaction runs as an int8 x int8 MXU matmul.
    """
    q = query_tokens.astype(jnp.float32)
    if index.proj is not None:
        q = q @ index.proj
    local = jnp.clip(candidate_ids - index.offset, 0, index.n_real - 1)
    scores = _score_gathered(
        index.token_codes[local], index.token_mask[local], q,
        query_mask.astype(bool), index.scale,
    )
    return jnp.where(candidate_ids >= 0, scores, -jnp.inf)


def _score_gathered(
    d_codes: jax.Array,  # [B, C, Lt, R]
    d_mask: jax.Array,  # [B, C, Lt]
    q: jax.Array,  # [B, Lq, R] f32 (already projected)
    qm: jax.Array,  # [B, Lq] bool
    scale: typ.Optional[jax.Array],
) -> jax.Array:
    """Sum-max interaction scores [B, C] of gathered candidate token blocks."""
    if scale is not None:
        qf = q * scale  # fold codec scale into the query
        q_row = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-8) / 127.0
        q_i8 = jnp.clip(jnp.round(qf / q_row), -127, 127).astype(jnp.int8)
        inter = jnp.einsum(
            "bqr,bctr->bcqt", q_i8, d_codes, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * q_row[:, None, :, :]
    else:
        inter = jnp.einsum(
            "bqr,bctr->bcqt", q.astype(d_codes.dtype), d_codes,
            preferred_element_type=jnp.float32,
        )
    neg = jnp.finfo(jnp.float32).min
    inter = jnp.where(d_mask[:, :, None, :], inter, neg)
    best = jnp.max(inter, axis=-1)  # [B, C, Lq]
    # docs with zero real tokens contribute 0, not -inf*Lq
    best = jnp.where(jnp.any(d_mask, axis=-1)[:, :, None], best, 0.0)
    return jnp.sum(jnp.where(qm[:, None, :], best, 0.0), axis=-1)


def maxsim_search(
    first_stage: typ.Callable[[SearchQueries, int], RetrievalBatch],
    index: MaxSimIndex,
    queries: SearchQueries,
    query_tokens: jax.Array,
    query_mask: jax.Array,
    top_k: int,
    *,
    n_candidates: typ.Optional[int] = None,
) -> RetrievalBatch:
    """Two-stage late-interaction search: pooled first stage -> MaxSim rerank.

    `first_stage(queries, k) -> RetrievalBatch` is any engine search partial
    (e.g. `lambda q, k: dense_search(idx, q, k)`); its top `n_candidates`
    (default 4*top_k) are re-scored with MaxSim and the final order is the
    MaxSim order.
    """
    c = n_candidates or 4 * top_k
    cand = first_stage(queries, c)
    scores = maxsim_rerank(index, query_tokens, query_mask, cand.indices)
    k_eff = min(top_k, scores.shape[-1])
    top_s, sel = jax.lax.top_k(scores, k_eff)
    top_i = jnp.take_along_axis(cand.indices, sel, axis=-1)
    if k_eff < top_k:
        top_s = jnp.pad(top_s, ((0, 0), (0, top_k - k_eff)), constant_values=-jnp.inf)
        top_i = jnp.pad(top_i, ((0, 0), (0, top_k - k_eff)), constant_values=-1)
    ok = jnp.isfinite(top_s)
    return RetrievalBatch(scores=jnp.where(ok, top_s, -jnp.inf), indices=jnp.where(ok, top_i, -1))
