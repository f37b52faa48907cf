"""Fused MIPS: matmul + streaming top-k in one Pallas TPU kernel.

The north-star centerpiece (BASELINE.json): "a flat dense index sharded across
HBM with a fused dot-product+top-k Pallas kernel". One kernel pass streams the
corpus through VMEM tiles, scores a tile on the MXU, and folds the tile's
winners into a running top-k held in VMEM scratch — the [B, N] score matrix
never exists, and no full-width sort ever runs (XLA's lax.top_k sorts the whole
row; here selection is k iterative masked argmaxes over [B, TILE+K_pad], which
is negligible next to the matmul for D >> k).

Grid iterations are sequential per TPU core, so scratch carries state across
tiles (standard streaming-reduction pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K_PAD = 128  # scratch top-k width (lane-aligned)


def _kernel(q_ref, v_ref, out_s_ref, out_i_ref, top_s, top_i, *, tile: int, k: int, n_real: int):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        top_s[:] = jnp.full_like(top_s[:], -jnp.inf)
        top_i[:] = jnp.full_like(top_i[:], -1)

    q = q_ref[:]  # [B, D]
    v = v_ref[:]  # [TILE, D]
    s = jax.lax.dot_general(
        q, v, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [B, TILE]
    row_ids = i * tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(row_ids < n_real, s, -jnp.inf)

    cat_s = jnp.concatenate([top_s[:], s], axis=-1)  # [B, K_PAD + TILE]
    cat_i = jnp.concatenate([top_i[:], row_ids], axis=-1)
    width = cat_s.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, cat_s.shape, 1)

    def select(j, carry):
        cs, ci, ns, ni = carry
        p = jnp.argmax(cs, axis=-1)  # [B]
        hit = lane == p[:, None]
        m = jnp.max(cs, axis=-1)
        sel_i = jnp.sum(jnp.where(hit, ci, 0), axis=-1)
        kcol = jax.lax.broadcasted_iota(jnp.int32, ns.shape, 1) == j
        ns = jnp.where(kcol, m[:, None], ns)
        ni = jnp.where(kcol, sel_i[:, None], ni)
        cs = jnp.where(hit, -jnp.inf, cs)
        return cs, ci, ns, ni

    init = (cat_s, cat_i, jnp.full_like(top_s[:], -jnp.inf), jnp.full_like(top_i[:], -1))
    _, _, new_s, new_i = jax.lax.fori_loop(0, k, select, init)
    top_s[:] = new_s
    top_i[:] = new_i

    @pl.when(i == n_tiles - 1)
    def _emit():
        out_s_ref[:] = top_s[:]
        out_i_ref[:] = top_i[:]


@functools.partial(jax.jit, static_argnames=("k", "tile", "n_real", "interpret"))
def fused_mips_topk(
    vectors: jax.Array,  # [N, D] (N multiple of tile)
    queries: jax.Array,  # [B, D] (B multiple of 8)
    *,
    k: int,
    tile: int = 1024,
    n_real: int = -1,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (scores [B, k], row ids [B, k]), exact top-k by inner product."""
    n, d = vectors.shape
    b = queries.shape[0]
    assert n % tile == 0, (n, tile)
    assert k <= _K_PAD
    if n_real < 0:
        n_real = n
    q = queries.astype(vectors.dtype)

    out_s, out_i = pl.pallas_call(
        functools.partial(_kernel, tile=tile, k=k, n_real=n_real),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, _K_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, _K_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, _K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((b, _K_PAD), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, _K_PAD), jnp.float32),
            pltpu.VMEM((b, _K_PAD), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * b, bytes_accessed=n * d * vectors.dtype.itemsize + b * d * 4, transcendentals=0
        ),
        interpret=interpret,
    )(q, vectors)
    return out_s[:, :k], out_i[:, :k]
