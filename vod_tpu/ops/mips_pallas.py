"""Fused MIPS: matmul + streaming top-k in one Pallas TPU kernel.

The north-star centerpiece (BASELINE.json): "a flat dense index sharded across
HBM with a fused dot-product+top-k Pallas kernel". One kernel pass streams the
corpus through VMEM tiles, scores a tile on the MXU, and folds the tile's
winners into running per-query-block state — the [B, N] score matrix never
exists in HBM. That is the whole point: the XLA-scan path materializes every
[B, chunk] score block to HBM before `approx_max_k` reads it back
(2 x B x N x 4 bytes of traffic — 16 GB at B=2048, N=1M, dwarfing the 1.5 GB
corpus read), while the fused kernel's HBM traffic is the corpus read plus
[B, bins] outputs, leaving the MXU as the only limit.

Grid layout = (query_blocks, corpus_tiles), corpus tile INNERMOST, and the
OUTPUT refs are the accumulators (the canonical Pallas streaming-reduction
pattern): the out BlockSpec index map ignores the corpus-tile grid dim, so the
[qblock, bins] block stays resident in VMEM across the whole inner loop and is
written back to HBM exactly once per query block. No scratch, no dynamic
indexing — everything Mosaic sees is a statically-shaped block. (An earlier
revision kept a [B_total, ...] scratch sliced by `pl.ds(qi*qblock)` with the
corpus tile outermost; Mosaic refuses dynamic scratch slicing —
`Check failed: limits[i] <= dim(i)` — and the accumulator pattern is simpler
anyway. Cost: the corpus is re-read once per query block, B/qblock * N * d * 2
bytes; at B=2048, qblock=512, 1M x 768 that is 6 GB ≈ 7 ms at v5e HBM bw,
on par with the ~16 ms of MXU time it overlaps with.)

Two selection strategies:

  * `fused_mips_topk` (exact): per tile, fold into a top-K_PAD buffer with k
    iterative masked argmaxes. Exact, but the selection VPU work (~k passes
    over [QB, K_PAD+TILE]) exceeds the tile's MXU time — measured slower than
    BOTH the scan and the binned path at every shape tried
    (`examples/mips_kernel_bench.py`). REFERENCE-ONLY: nothing
    routes here from config (`kernel: "fused"` selects the binned kernel); it
    is kept as the exactness oracle the binned kernel is tested against.
  * `fused_mips_binned` (approx, the fast path): per tile, a strided max
    folds scores into `bins` running (score, id) cells — bin(j) = j mod bins —
    exactly the PartialReduce binning `lax.approx_max_k` uses, but fused with
    the matmul. Selection cost ~3 passes over the tile, negligible vs the
    matmul. Final `lax.top_k` over [B, bins] runs outside the kernel on a
    tiny array. Expected recall@k ~= 1 - (k-1)/(2*bins) (id-order is
    arbitrary, so global winners spread uniformly over bins).
"""

from __future__ import annotations

import functools
import typing as typ

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K_PAD = 128  # exact-kernel top-k width (lane-aligned)


def _exact_kernel(q_ref, v_ref, out_s_ref, out_i_ref, *, tile, qblock, k, n_real):
    ti = pl.program_id(1)  # corpus tile (innermost)
    n_tiles = pl.num_programs(1)

    @pl.when(ti == 0)
    def _init():
        out_s_ref[:] = jnp.full((qblock, _K_PAD), -jnp.inf, dtype=jnp.float32)
        out_i_ref[:] = jnp.full((qblock, _K_PAD), -1, dtype=jnp.int32)

    q = q_ref[:]  # [QB, D]
    v = v_ref[:]  # [TILE, D]
    s = jax.lax.dot_general(
        q, v, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [QB, TILE]
    row_ids = ti * tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(row_ids < n_real, s, -jnp.inf)

    cat_s = jnp.concatenate([out_s_ref[:], s], axis=-1)  # [QB, K_PAD + TILE]
    cat_i = jnp.concatenate([out_i_ref[:], row_ids], axis=-1)
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
    out_s_ref[:] = new_s
    out_i_ref[:] = new_i


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
        functools.partial(_exact_kernel, tile=tile, qblock=qblock, k=k, n_real=n_real),
        grid=(b // qblock, n // tile),
        in_specs=[
            pl.BlockSpec((qblock, d), lambda qi, ti: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda qi, ti: (ti, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qblock, _K_PAD), lambda qi, ti: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qblock, _K_PAD), lambda qi, ti: (qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, _K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((b, _K_PAD), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * b,
            bytes_accessed=(b // qblock) * n * d * vectors.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, vectors)
    return out_s[:, :k], out_i[:, :k]


_INT32_MIN = -(2**31) + 1


def _binned_kernel(n_real_ref, q_ref, v_ref, out_s_ref, out_i_ref, *, tile, qblock, bins, acc_dtype):
    ti = pl.program_id(1)  # corpus tile (innermost)
    neg = _INT32_MIN if acc_dtype == jnp.int32 else -jnp.inf
    n_real = n_real_ref[0]  # scalar-prefetched: dynamic row-validity bound

    @pl.when(ti == 0)
    def _init():
        out_s_ref[:] = jnp.full((qblock, bins), neg, dtype=acc_dtype)
        out_i_ref[:] = jnp.full((qblock, bins), -1, dtype=jnp.int32)

    q = q_ref[:]  # [QB, D]
    v = v_ref[:]  # [TILE, D]
    s = jax.lax.dot_general(
        q, v, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=acc_dtype
    )  # [QB, TILE]

    # strided bin-max: bin(j) = j mod bins; static unrolled slices stay
    # lane-tile aligned (bins is a multiple of 128), ~tile/bins VPU passes.
    # Row ids are built per-slice at [QB, bins] from a scalar offset + lane
    # iota — slicing one wide [QB, tile] int32 iota and storing it crashes
    # Mosaic ("Check failed: limits[i] <= dim(i)"); this form lowers clean.
    lane = jax.lax.broadcasted_iota(jnp.int32, (qblock, bins), 1)
    m = None
    mi = None
    for r in range(tile // bins):
        chunk = s[:, r * bins : (r + 1) * bins]
        ci = ti * tile + r * bins + lane
        chunk = jnp.where(ci < n_real, chunk, neg)
        if m is None:
            m, mi = chunk, ci
        else:
            better = chunk > m
            m = jnp.where(better, chunk, m)
            mi = jnp.where(better, ci, mi)

    cur_s = out_s_ref[:]
    cur_i = out_i_ref[:]
    improved = m > cur_s
    out_s_ref[:] = jnp.where(improved, m, cur_s)
    out_i_ref[:] = jnp.where(improved, mi, cur_i)


@functools.partial(jax.jit, static_argnames=("k", "tile", "qblock", "bins", "interpret"))
def fused_mips_binned(
    vectors: jax.Array,  # [N, D] (N multiple of tile)
    queries: jax.Array,  # [B, D] (B multiple of qblock, or > qblock and chunked)
    *,
    k: int,
    tile: int = 1024,
    qblock: int = 2048,
    bins: int = 512,
    n_real: typ.Union[int, jax.Array] = -1,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Approximate top-k by inner product (PartialReduce-style binning fused
    into the matmul). Returns (scores [B, k], row ids [B, k]); expected
    recall@k ~= 1 - (k-1)/(2*bins).

    Defaults (tile=1024, qblock=2048, bins=512) are the measured optimum at the
    headline shape (1M x 768 bf16, B=2048, k=10 on v5e-1): 118k QPS vs the XLA
    scan's 109k at recall@10 0.985 vs 0.998 (examples/mips_kernel_bench.py).
    VMEM at these settings: q 3MB + v-tile 1.5MBx2 + scores 8MB + out 8MB ~=
    16MB. Batches larger than `qblock` are processed as an outer `lax.map`
    over qblock-sized chunks — one kernel call per chunk keeps the out-window
    single-buffered (multi-query-block grids double-buffer the out windows and
    blow scoped VMEM).

    int8 path: when `vectors` is int8, `queries` must be int8 too (per-row
    quantized, see `dense_search`); accumulation runs end-to-end in int32 on
    the int8-MXU path (2x the bf16 rate). A positive per-row query scale
    preserves within-row ordering, so the caller applies it to the returned
    scores AFTER the kernel — the kernel never sees floats. Masked/padded
    cells then hold INT32_MIN instead of -inf.

    `n_real` may be a TRACED scalar (it is scalar-prefetched into SMEM): the
    sharded engine passes a per-shard row-validity bound computed from
    `axis_index` inside `shard_map`."""
    n, d = vectors.shape
    b = queries.shape[0]
    if isinstance(n_real, int) and n_real < 0:
        n_real = n
    if b > qblock:
        # pad the batch up to a multiple of qblock so any B works, then map
        # qblock-sized chunks (padded rows are discarded after the kernel)
        b_pad = (-b) % qblock
        qp = jnp.pad(queries, ((0, b_pad), (0, 0))) if b_pad else queries
        out_s, out_i = jax.lax.map(
            lambda qq: fused_mips_binned(
                vectors, qq, k=k, tile=tile, qblock=qblock, bins=bins,
                n_real=n_real, interpret=interpret,
            ),
            qp.reshape((b + b_pad) // qblock, qblock, d),
        )
        return out_s.reshape(b + b_pad, k)[:b], out_i.reshape(b + b_pad, k)[:b]
    qblock = b
    tile = min(tile, n)
    bins = min(bins, tile)
    assert n % tile == 0, (n, tile)
    assert tile % bins == 0, (tile, bins)
    assert k <= bins
    int8_path = vectors.dtype == jnp.int8
    acc_dtype = jnp.int32 if int8_path else jnp.float32
    if int8_path:
        assert queries.dtype == jnp.int8, "int8 corpus requires int8-quantized queries"
        q = queries
    else:
        q = queries.astype(vectors.dtype)

    bin_s, bin_i = pl.pallas_call(
        functools.partial(
            _binned_kernel, tile=tile, qblock=qblock, bins=bins, acc_dtype=acc_dtype,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # n_real rides in SMEM (may be traced)
            grid=(b // qblock, n // tile),
            in_specs=[
                pl.BlockSpec((qblock, d), lambda qi, ti, nr: (qi, 0)),
                pl.BlockSpec((tile, d), lambda qi, ti, nr: (ti, 0)),
            ],
            out_specs=[
                pl.BlockSpec((qblock, bins), lambda qi, ti, nr: (qi, 0)),
                pl.BlockSpec((qblock, bins), lambda qi, ti, nr: (qi, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, bins), acc_dtype),
            jax.ShapeDtypeStruct((b, bins), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * b,
            bytes_accessed=(b // qblock) * n * d * vectors.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(n_real, jnp.int32).reshape(1), q, vectors)
    top_s, pos = jax.lax.top_k(bin_s, k)  # tiny: [B, bins] -> [B, k]
    top_i = jnp.take_along_axis(bin_i, pos, axis=-1)
    if int8_path:
        return top_s, jnp.where(top_s > _INT32_MIN, top_i, -1)
    return top_s, jnp.where(jnp.isfinite(top_s), top_i, -1)
