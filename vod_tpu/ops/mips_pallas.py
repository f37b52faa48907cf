"""Fused MIPS: matmul + streaming top-k in one Pallas TPU kernel.

The north-star centerpiece (BASELINE.json): "a flat dense index sharded across
HBM with a fused dot-product+top-k Pallas kernel". One kernel pass streams the
corpus through VMEM tiles, scores a tile on the MXU, and folds the tile's
winners into a running top-k held in VMEM scratch — the [B, N] score matrix
never exists and no full-width sort ever runs (selection is k iterative masked
argmaxes, negligible next to the matmul for D >> k).

Grid layout = (corpus_tiles, query_blocks), corpus tile OUTER: the tile's VMEM
residency is reused across every query block (HBM reads the corpus exactly once
per kernel call regardless of batch size), while the running top-k scratch is
[B_total, K_PAD] so large batches never blow VMEM. Grid iterations are
sequential per core, so scratch carries state across steps (standard streaming-
reduction pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K_PAD = 128  # scratch top-k width (lane-aligned)


def _kernel(q_ref, v_ref, out_s_ref, out_i_ref, top_s, top_i, *, tile, qblock, k, n_real):
    ti = pl.program_id(0)  # corpus tile (outer)
    qi = pl.program_id(1)  # query block (inner)
    n_tiles = pl.num_programs(0)

    rows = pl.ds(qi * qblock, qblock)

    @pl.when(ti == 0)
    def _init():
        top_s[rows, :] = jnp.full((qblock, _K_PAD), -jnp.inf, dtype=jnp.float32)
        top_i[rows, :] = jnp.full((qblock, _K_PAD), -1, dtype=jnp.int32)

    q = q_ref[:]  # [QB, D]
    v = v_ref[:]  # [TILE, D]
    s = jax.lax.dot_general(
        q, v, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [QB, TILE]
    row_ids = ti * tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(row_ids < n_real, s, -jnp.inf)

    cat_s = jnp.concatenate([top_s[rows, :], s], axis=-1)  # [QB, K_PAD + TILE]
    cat_i = jnp.concatenate([top_i[rows, :], row_ids], axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, cat_s.shape, 1)

    def select(j, carry):
        cs, ci, ns, ni = carry
        p = jnp.argmax(cs, axis=-1)  # [QB]
        hit = lane == p[:, None]
        m = jnp.max(cs, axis=-1)
        sel_i = jnp.sum(jnp.where(hit, ci, 0), axis=-1)
        kcol = jax.lax.broadcasted_iota(jnp.int32, ns.shape, 1) == j
        ns = jnp.where(kcol, m[:, None], ns)
        ni = jnp.where(kcol, sel_i[:, None], ni)
        cs = jnp.where(hit, -jnp.inf, cs)
        return cs, ci, ns, ni

    init = (
        cat_s,
        cat_i,
        jnp.full((qblock, _K_PAD), -jnp.inf, dtype=jnp.float32),
        jnp.full((qblock, _K_PAD), -1, dtype=jnp.int32),
    )
    _, _, new_s, new_i = jax.lax.fori_loop(0, k, select, init)
    top_s[rows, :] = new_s
    top_i[rows, :] = new_i

    @pl.when(ti == n_tiles - 1)
    def _emit():
        out_s_ref[:] = top_s[rows, :]
        out_i_ref[:] = top_i[rows, :]


@functools.partial(jax.jit, static_argnames=("k", "tile", "qblock", "n_real", "interpret"))
def fused_mips_topk(
    vectors: jax.Array,  # [N, D] (N multiple of tile)
    queries: jax.Array,  # [B, D] (B multiple of qblock)
    *,
    k: int,
    tile: int = 2048,
    qblock: int = 256,
    n_real: int = -1,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (scores [B, k], row ids [B, k]), exact top-k by inner product."""
    n, d = vectors.shape
    b = queries.shape[0]
    qblock = min(qblock, b)
    assert n % tile == 0, (n, tile)
    assert b % qblock == 0, (b, qblock)
    assert k <= _K_PAD
    if n_real < 0:
        n_real = n
    q = queries.astype(vectors.dtype)

    out_s, out_i = pl.pallas_call(
        functools.partial(_kernel, tile=tile, qblock=qblock, k=k, n_real=n_real),
        grid=(n // tile, b // qblock),
        in_specs=[
            pl.BlockSpec((qblock, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qblock, _K_PAD), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qblock, _K_PAD), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
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
            flops=2 * n * d * b,
            bytes_accessed=n * d * vectors.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, vectors)
    return out_s[:, :k], out_i[:, :k]
