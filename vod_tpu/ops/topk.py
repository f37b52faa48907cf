"""Hierarchical top-k for wide score rows.

`jax.lax.top_k` over a [B, C] row with C in the 100k+ range is sort-dominated on
TPU. Exact two-stage selection: top-k within fixed blocks (cheap, vectorized),
then top-k over the nb*k block winners — exact for any k <= block because a
global top-k element is necessarily a top-k element of its own block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def block_topk(x: jax.Array, k: int, block: int = 1024) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over the last axis via per-block pre-selection.

    x: [..., C]. Returns (values [..., k], indices [..., k] into the last axis).
    """
    c = x.shape[-1]
    if c <= max(block, 2 * k):
        return jax.lax.top_k(x, min(k, c))
    k_eff = min(k, c)
    nb = -(-c // block)
    pad = nb * block - c
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=-jnp.inf)
    xr = x.reshape(*x.shape[:-1], nb, block)
    kb = min(k_eff, block)
    s1, i1 = jax.lax.top_k(xr, kb)  # [..., nb, kb]
    base = (jnp.arange(nb) * block)[..., :, None]
    flat_s = s1.reshape(*x.shape[:-1], nb * kb)
    flat_i = (i1 + base).reshape(*x.shape[:-1], nb * kb)
    s2, pos = jax.lax.top_k(flat_s, k_eff)
    i2 = jnp.take_along_axis(flat_i, pos, axis=-1)
    return s2, i2
