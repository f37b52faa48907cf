"""Priority sampling (sampling without replacement via exponential races) in pure JAX.

Parity: reference `vod_dataloaders/core/sample.py` — numba kernels
`_priority_sampling_1d` (`sample.py:160`) and `_labeled_priority_sampling_1d_`
(`sample.py:245`). Algorithm (Duffield et al., arXiv cs/0509026):

  log_p  = log_softmax(scores * temperature)          # note: reference *multiplies*
  keys_i = log_p_i - log(e_i),  e_i ~ Exp(1)          # by `temperature` (a beta)
  S      = top-k by key;  log_tau = (k+1)-th key (or -inf if k >= n)
  q_i    = P(key_i > tau) = 1 - exp(-exp(log_p_i - log_tau))
  log_w  = log_p_i - log q_i                          # unbiased importance weights

The labeled variant samples positives (label > 0) and negatives independently,
rebalancing counts when one group is short (reference `sample.py:267-278`).

Design deviations (documented):
  * RNG is an explicit JAX key (reference uses the global numpy RNG, `sample.py:365`).
  * All shapes static: per-group sampling uses masks over the full row; dynamic
    group sizes are handled with dynamic indices, never dynamic shapes.
  * `max_support_size` keeps the TOP `max_support_size` entries; the reference's
    numba code (`sample.py:178`) fills entries *above* the threshold with -inf,
    which keeps the tail instead — contradicting its own docstring ("truncate to the
    top `max_support_size`"). We implement the documented intent.
  * lse constants: the reference computes them *after* normalizing log_p in place
    (`sample.py:180-184`), so they are identically 0 for non-empty groups; here they
    are the actual per-group logsumexp of `scores * temperature` — the normalizer the
    VOD estimator needs (reference leaves `VodGradients` a stub, `vod.py:26`).
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import struct

from vod_tpu.types.retrieval import RetrievalBatch
from .numpy_ops import masked_log_softmax, masked_logsumexp

# Finite "almost -inf" used so in-group entries always outrank out-of-group entries
# when sorting keys, even when their scores are -inf.
_NEG_BIG_FRAC = 0.5


def _neg_big(dtype) -> jax.Array:
    return jnp.asarray(-jnp.finfo(dtype).max * _NEG_BIG_FRAC, dtype=dtype)


def _log1mexp(neg_x: jax.Array) -> jax.Array:
    """Stable log(1 - exp(-x)) for x = exp(delta) given delta = log x.

    For delta << 0, log(1 - e^{-e^delta}) ~= delta.
    """
    x = jnp.exp(neg_x)
    small = neg_x < -10.0
    # guard exp(-x) domain; where x is huge, -expm1(-x) -> 1, log -> 0.
    safe = jnp.log(jnp.maximum(-jnp.expm1(-x), jnp.finfo(x.dtype).tiny))
    return jnp.where(small, neg_x, safe)


def _masked_priority_sample_row(
    rng: jax.Array,
    scores: jax.Array,  # [n] unnormalized log p
    mask: jax.Array,  # [n] bool group membership
    k_out: int,  # static output width
    k_dyn: jax.Array,  # traced number of samples to draw (<= k_out)
    temperature: float,
    max_support_size: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sample up to `k_dyn` elements of the masked group. Returns (ids, log_w, lse).

    Entries at rank >= min(k_dyn, group_size) are junk — callers mask them.
    """
    n = scores.shape[-1]
    dtype = scores.dtype
    neg_big = _neg_big(dtype)

    beta = temperature if temperature > 0 else 1.0
    log_p = jnp.where(mask, scores * beta, -jnp.inf)
    log_p = jnp.where(jnp.isnan(log_p), -jnp.inf, log_p)

    if max_support_size > 0 and max_support_size < n:
        sorted_desc = -jnp.sort(-log_p)
        thresh = sorted_desc[max_support_size - 1]
        log_p = jnp.where(log_p >= thresh, log_p, -jnp.inf)

    lse = masked_logsumexp(scores * beta, mask)
    log_p = masked_log_softmax(log_p)

    if temperature > 0:
        e = jax.random.exponential(rng, (n,), dtype=dtype)
        keys = log_p - jnp.log(e)
    else:
        keys = log_p
    # In-group -inf keys become a finite huge negative so they outrank out-of-group.
    keys = jnp.where(mask, jnp.maximum(keys, neg_big), -jnp.inf)

    order = jnp.argsort(-keys, axis=-1, stable=True)
    sorted_keys = jnp.take_along_axis(keys, order, axis=-1)
    padded = jnp.concatenate([sorted_keys, jnp.asarray([-jnp.inf], dtype=dtype)])
    tau_raw = padded[jnp.clip(k_dyn, 0, n)]
    log_tau = jnp.where(tau_raw <= neg_big, -jnp.inf, tau_raw)

    ids = order[:k_out]
    log_pi = log_p[ids]

    delta = log_pi - log_tau
    log_qz = _log1mexp(jnp.where(jnp.isfinite(delta), delta, 0.0))
    weighted = log_pi - log_qz
    log_w = jnp.where(jnp.isfinite(log_tau) & jnp.isfinite(log_pi), weighted, log_pi)
    return ids, log_w, lse


def priority_sampling(
    rng: jax.Array,
    scores: jax.Array,
    k: int,
    temperature: float = 1.0,
    max_support_size: int = -1,
) -> tuple[jax.Array, jax.Array]:
    """Priority sampling from unnormalized log p (parity: `priority_sampling_1d`, `sample.py:222`).

    Supports [n] or [B, n] scores; returns (ids [..., k], log_weights [..., k]).
    """
    if scores.ndim == 1:
        mask = jnp.ones(scores.shape, dtype=bool)
        ids, log_w, _ = _masked_priority_sample_row(
            rng, scores, mask, k, jnp.asarray(min(k, scores.shape[-1])), temperature, max_support_size
        )
        return ids, log_w

    keys = jax.random.split(rng, scores.shape[0])
    mask = jnp.ones(scores.shape[-1], dtype=bool)
    k_dyn = jnp.asarray(min(k, scores.shape[-1]))
    fn = lambda r, s: _masked_priority_sample_row(r, s, mask, k, k_dyn, temperature, max_support_size)
    ids, log_w, _ = jax.vmap(fn)(keys, scores)
    return ids, log_w


def _labeled_priority_sample_row(
    rng: jax.Array,
    scores: jax.Array,  # [n]
    labels: jax.Array,  # [n] bool or int (>0 = positive)
    k_positive: int,
    k_total: int,
    normalized: bool,
    temperature: float,
    max_support_size: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    n = scores.shape[-1]
    dtype = scores.dtype
    pos_mask = labels if labels.dtype == jnp.bool_ else labels > 0
    neg_mask = ~pos_mask
    is_finite = jnp.isfinite(scores)

    n_pos_total = jnp.sum(pos_mask)
    n_neg_total = jnp.sum(neg_mask)
    n_neg_finite = jnp.sum(neg_mask & is_finite)

    k_total_eff = min(k_total, n)  # static (parity: `sample.py:269`)
    # Rebalance: not enough finite negatives -> draw more positives (`sample.py:277-278`).
    k_pos = jnp.where(n_neg_finite < k_total_eff - k_positive, k_total_eff - n_neg_finite, k_positive)
    k_pos = jnp.clip(k_pos, 0, k_total_eff)
    n_pos_out = jnp.minimum(k_pos, n_pos_total)
    k_neg = k_total_eff - n_pos_out

    rng_pos, rng_neg = jax.random.split(rng)
    ids_p, w_p, lse_p = _masked_priority_sample_row(
        rng_pos, scores, pos_mask, k_total_eff, k_pos, temperature, max_support_size
    )
    ids_n, w_n, lse_n = _masked_priority_sample_row(
        rng_neg, scores, neg_mask, k_total_eff, k_neg, temperature, max_support_size
    )

    ranks = jnp.arange(k_total_eff)
    valid_p = ranks < n_pos_out
    n_neg_out = jnp.minimum(k_neg, n_neg_total)
    valid_n = ranks < n_neg_out

    if normalized:
        # Self-normalize within each drawn group (`sample.py:289-302`).
        w_p = masked_log_softmax(jnp.where(valid_p, w_p, -jnp.inf))
        w_n = masked_log_softmax(jnp.where(valid_n, w_n, -jnp.inf))

    # Assemble: positives first, then negatives, then padding (`sample.py:310-320`).
    out_ranks = jnp.arange(k_total)
    is_pos_slot = out_ranks < n_pos_out
    src = jnp.where(is_pos_slot, out_ranks, out_ranks - n_pos_out)
    src = jnp.clip(src, 0, k_total_eff - 1)
    neg_valid_slot = (~is_pos_slot) & (src < n_neg_out)

    take = lambda arr_p, arr_n: jnp.where(is_pos_slot, arr_p[src], arr_n[src])
    samples = take(ids_p, ids_n)
    log_w = take(w_p, w_n)
    out_labels = is_pos_slot.astype(jnp.int32)

    filled = is_pos_slot | neg_valid_slot
    samples = jnp.where(filled, samples, -1)
    log_w = jnp.where(filled, log_w, -jnp.inf)
    out_labels = jnp.where(filled, out_labels, 0)

    lse = jnp.stack([lse_p, lse_n]).astype(dtype)
    return samples, log_w, out_labels, lse


def labeled_priority_sampling(
    rng: jax.Array,
    scores: jax.Array,
    labels: jax.Array,
    k_positive: int = 1,
    k_total: int = 2,
    normalized: bool = True,
    temperature: float = 1.0,
    max_support_size: typ.Optional[int] = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-label priority sampling (parity: `labeled_priority_sampling`, `sample.py:87`).

    Returns (sample local ids [..., k_total], log_weights, labels {0,1}, lse [..., 2]).
    """
    mss = max_support_size or -1
    if mss >= 0:
        mss = max(mss, k_total)  # parity: `sample.py:134-135`
    if scores.ndim == 1:
        return _labeled_priority_sample_row(
            rng, scores, labels, k_positive, k_total, normalized, temperature, mss
        )
    keys = jax.random.split(rng, scores.shape[0])
    fn = lambda r, s, l: _labeled_priority_sample_row(
        r, s, l, k_positive, k_total, normalized, temperature, mss
    )
    return jax.vmap(fn)(keys, scores, labels)


@struct.dataclass
class PrioritySampledSections:
    """Samples plus importance weights (parity: `sample.py:10-19`).

    A pytree, so it can be returned from jitted search/sample pipelines.
    """

    batch: RetrievalBatch
    log_weights: jax.Array
    max_sampling_id: jax.Array
    lse_pos: jax.Array
    lse_neg: jax.Array
    raw_scores: dict[str, jax.Array]


def sample_search_results(
    rng: jax.Array,
    *,
    search_results: RetrievalBatch,
    raw_scores: dict[str, jax.Array],
    total: typ.Optional[int],
    max_pos_sections: typ.Optional[int],
    temperature: float = 1.0,
    max_support_size: typ.Optional[int] = None,
) -> PrioritySampledSections:
    """Sample positive/negative sections via per-label priority sampling.

    Parity: reference `sample_search_results` (`sample.py:22`): draws the samples,
    gathers the sampled indices/scores/raw-scores, and computes the
    `max_sampling_id` sampling-depth diagnostic (`sample.py:66-71`).
    """
    total = total or search_results.scores.shape[-1]
    max_pos_sections = max_pos_sections or total

    labels_ref = (
        jnp.zeros(search_results.scores.shape, dtype=bool)
        if search_results.labels is None
        else search_results.labels > 0
    )
    local_ids, log_weights, labels, constants = labeled_priority_sampling(
        rng,
        search_results.scores,
        labels_ref,
        k_positive=max_pos_sections,
        k_total=total,
        normalized=True,
        temperature=temperature,
        max_support_size=max_support_size,
    )

    safe_ids = jnp.clip(local_ids, 0, search_results.scores.shape[-1] - 1)
    pad = local_ids < 0
    indices = jnp.where(pad, -1, jnp.take_along_axis(search_results.indices, safe_ids, axis=-1))
    scores = jnp.where(pad, -jnp.inf, jnp.take_along_axis(search_results.scores, safe_ids, axis=-1))
    sampled_raw = {
        key: jnp.where(pad, jnp.nan, jnp.take_along_axis(v, safe_ids, axis=-1))
        for key, v in raw_scores.items()
    }

    # Sampling-depth diagnostic (`sample.py:66-71`).
    min_neg_score = jnp.min(
        jnp.where((labels <= 0) & jnp.isfinite(scores), scores, jnp.inf), axis=-1, keepdims=True
    )
    larger = (~labels_ref) & jnp.isfinite(search_results.scores) & (search_results.scores >= min_neg_score)
    max_sampling_id = jnp.sum(larger.astype(jnp.float32), axis=-1)

    return PrioritySampledSections(
        batch=RetrievalBatch(indices=indices, scores=scores, labels=labels),
        max_sampling_id=max_sampling_id,
        lse_pos=constants[..., 0],
        lse_neg=constants[..., 1],
        log_weights=log_weights,
        raw_scores=sampled_raw,
    )
