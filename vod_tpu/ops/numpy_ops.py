"""Elementary vectorized kernels (parity: reference `vod_dataloaders/core/numpy_ops.py`).

Every op here is a pure function of jnp arrays — jit/vmap-compatible, static shapes —
replacing the reference's in-place numba loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_log_softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """log_softmax treating NaN as -inf and tolerating all--inf rows.

    Parity: reference `log_softmax_1d_` (`numpy_ops.py:208`) — NaNs are filled with
    -inf, the max is subtracted (0 if all entries are -inf), then the LSE.
    All--inf rows return -inf everywhere (not NaN).
    """
    x = jnp.where(jnp.isnan(x), -jnp.inf, x)
    x_max = jnp.max(x, axis=axis, keepdims=True)
    x_max = jnp.where(jnp.isfinite(x_max), x_max, 0.0)
    shifted = x - x_max
    # exp(-inf) = 0; sum may be 0 for all--inf rows -> log(0) = -inf; shifted - lse
    # would then be -inf - (-inf) = nan, so guard the empty-row case explicitly.
    sum_exp = jnp.sum(jnp.exp(shifted), axis=axis, keepdims=True)
    lse = jnp.log(jnp.maximum(sum_exp, jnp.finfo(x.dtype).tiny))
    out = shifted - lse
    return jnp.where(jnp.isfinite(x), out, -jnp.inf)


def masked_softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """softmax with NaN/-inf-safe semantics (parity: `softmax_1d`, `numpy_ops.py:234`)."""
    return jnp.exp(masked_log_softmax(x, axis=axis))


def masked_logsumexp(x: jax.Array, mask: jax.Array | None = None, axis: int = -1) -> jax.Array:
    """logsumexp over entries where `mask` is True; -inf entries contribute nothing.

    Returns -inf where the mask selects nothing.
    """
    if mask is not None:
        x = jnp.where(mask, x, -jnp.inf)
    x = jnp.where(jnp.isnan(x), -jnp.inf, x)
    x_max = jnp.max(x, axis=axis, keepdims=True)
    safe_max = jnp.where(jnp.isfinite(x_max), x_max, 0.0)
    sum_exp = jnp.sum(jnp.exp(x - safe_max), axis=axis, keepdims=True)
    out = safe_max + jnp.log(jnp.maximum(sum_exp, jnp.finfo(x.dtype).tiny))
    out = jnp.where(jnp.isfinite(x_max), out, -jnp.inf)
    return jnp.squeeze(out, axis=axis)


def gather_values_by_indices(
    queries: jax.Array,
    indices: jax.Array,
    values: jax.Array,
    fill_value: float | int | None = None,
) -> jax.Array:
    """For each query id, return the value whose key matches it (first match).

    Parity: reference `gather_values_by_indices` (`numpy_ops.py:126`) — supports
    queries [B, M] against per-row keys [B, K] or shared keys [K]. Default fill is
    NaN for floats, -1 for ints (`numpy_ops.py:16-21`).

    Implementation: an equality mask + argmax — O(M*K) but fully vectorized; K is a
    few hundred on the hot path, so the mask fits comfortably on-chip.
    """
    if fill_value is None:
        fill_value = jnp.nan if jnp.issubdtype(values.dtype, jnp.floating) else -1
    if indices.ndim == queries.ndim - 1:
        indices = jnp.broadcast_to(indices[None], queries.shape[:1] + indices.shape)
        values = jnp.broadcast_to(values[None], queries.shape[:1] + values.shape)
    eq = queries[..., :, None] == indices[..., None, :]  # [..., M, K]
    found = jnp.any(eq, axis=-1)
    pos = jnp.argmax(eq, axis=-1)
    gathered = jnp.take_along_axis(values, pos, axis=-1)
    return jnp.where(found, gathered, jnp.asarray(fill_value, dtype=values.dtype))


def normalize_scores(scores: jax.Array, offset: float = 0.0, axis: int = -1) -> jax.Array:
    """Min-subtract normalization so engine scores are merge-comparable.

    Parity: reference `normalize_search_scores_` (`core/normalize.py:6`) — subtract
    the per-row finite minimum; -inf padding is preserved. `offset` shifts the
    result so the minimum lands at `offset`.
    """
    finite = jnp.isfinite(scores)
    big = jnp.finfo(scores.dtype).max
    row_min = jnp.min(jnp.where(finite, scores, big), axis=axis, keepdims=True)
    row_min = jnp.where(row_min == big, 0.0, row_min)  # all-padding rows
    return jnp.where(finite, scores - row_min + offset, scores)


def fill_nans_with_min(values: jax.Array, offset_min_value: float | None = -1.0, axis: int = -1) -> jax.Array:
    """Replace NaNs with (row min + offset) (parity: `fill_nans_with_min`, `numpy_ops.py:242`)."""
    isnan = jnp.isnan(values)
    big = jnp.finfo(values.dtype).max
    row_min = jnp.min(jnp.where(isnan, big, values), axis=axis, keepdims=True)
    row_min = jnp.where(row_min == big, 0.0, row_min)
    if offset_min_value is not None:
        row_min = row_min + offset_min_value
    return jnp.where(isnan, row_min, values)


def replace_negative_indices(indices: jax.Array, world_size: int, rng: jax.Array) -> jax.Array:
    """Replace padding (-1) ids with uniform random valid ids.

    Parity: reference `replace_negative_indices_` (`numpy_ops.py:257`) — the collate
    uses this so padded slots fetch *some* section (their scores stay -inf so they
    never contribute to the loss). The RNG is an explicit JAX key (the reference
    uses the global numpy RNG).
    """
    rand = jax.random.randint(rng, indices.shape, 0, world_size, dtype=indices.dtype)
    return jnp.where(indices < 0, rand, indices)
