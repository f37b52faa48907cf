"""Dense MIPS indexes resident in device HBM.

Parity: replaces the reference's faiss backend (`src/vod_search/faiss_search/` —
factory strings `Flat`, `IVFauto,Flat`, `OPQ32_512,IVFauto,PQ32x8`) and the qdrant
backend (HNSW + int8 quantization). Three codecs:

  * flat  — raw bf16/f32 vectors, exhaustive MXU matmul + streaming top-k;
  * int8  — per-dim symmetric int8 (qdrant scalar-quantization parity) at 1 byte/dim;
  * pq    — coarse int8 PCA-projected scan over ALL rows (MXU) + PQ ADC rescore of
            the top candidates (faiss `OPQ…,PQ32x8` memory parity; see ops/pq.py
            for why this beats IVF cell-probing on TPU).

The corpus scan is a `lax.scan` over row-chunks with a running top-k carry, so the
[B, N] score matrix never materializes (SURVEY §7 "hard part #1").
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import struct

from vod_tpu.ops import pq as pq_ops
from vod_tpu.types.retrieval import RetrievalBatch
from .base import SearchQueries


@struct.dataclass
class DenseIndex:
    """Flat (optionally int8-quantized) dense index."""

    vectors: jax.Array  # [N, D] bf16/f32, or int8 codes
    scale: typ.Optional[jax.Array] = None  # [1, D] f32 when int8
    subset_ids: typ.Optional[jax.Array] = None  # [N] int32
    # Optional exact-f32 re-rank rows (faiss `Flat,RFlat` analogue): the
    # scan/kernel selects k_factor*k candidates from the bf16/int8 store, then
    # a tiny gather + HIGHEST-precision matmul restores exact f32 ordering OF
    # THE POOL. bf16 score rounding alone costs ~1.1pp recall@10 vs f32 ground
    # truth at 1M x 768 (measured: exact-selection bf16 scan = 0.989; +refine
    # k_factor=4 = 1.000 at ~92% of the raw scan's QPS). End-to-end EXACTNESS
    # additionally needs the pool to cover the bf16 tie band (many rows share
    # one bf16 bucket when score gaps < ~2^-8 * |score|) — size k_factor up
    # (e.g. 16) and set approx_recall=None when exact order is required.
    refine_rows: typ.Optional[jax.Array] = None  # [N, D] f32
    n_real: int = struct.field(pytree_node=False, default=0)  # rows before padding
    offset: int = struct.field(pytree_node=False, default=0)  # global-id offset
    k_factor: int = struct.field(pytree_node=False, default=4)  # refine pool = k_factor*k
    # approx_max_k recall target; None = exact lax.top_k (faiss-Flat parity).
    approx_recall: typ.Optional[float] = struct.field(pytree_node=False, default=0.95)
    # "scan" = lax.scan chunks + approx_max_k; "fused" = the Pallas
    # matmul+binned-top-k kernel (ops/mips_pallas.py) — measured 118k vs 109k
    # QPS at the 1M x 768 headline shape, recall@10 0.985 vs 0.998.
    kernel: str = struct.field(pytree_node=False, default="scan")
    # fused-kernel selection knobs (runtime-tunable static metadata, like
    # nprobe/k_factor): more bins = higher recall (~1-(k-1)/(2*bins)) at more
    # VMEM; qblock shrinks to keep the bin buffers in scoped VMEM at bins=1024.
    fused_bins: int = struct.field(pytree_node=False, default=512)
    fused_qblock: int = struct.field(pytree_node=False, default=2048)


@struct.dataclass
class PQIndex:
    """PQ-compressed index: exhaustive ADC or int8 coarse-scan + ADC rescore.

    Three candidate-generation modes (chosen at build time):
      * exhaustive (`coarse_codes is None`) — ADC over ALL rows. Key identity:
        the ADC inner product sum_m lut[m, code] equals q . decode(codes), so
        exhaustive ADC is a decode-then-matmul streaming scan on the MXU — no
        per-row LUT gathers, no coarse-stage recall loss. Memory = M B/vector.
      * coarse — int8 PCA-projected scan picks `n_candidates`, ADC rescores
        them (adds coarse_dim B/vector, trades recall for speed at large N).
      * coarse→refine direct (`codes is None`, requires coarse + refine) —
        the coarse scan's top k_factor*k go STRAIGHT to the exact re-rank, no
        PQ stage at all (faiss `PCAR{dc},SQ8,Refine(...)` analogue). This is
        the small-batch SERVING codec: the whole pass is ONE int8 MXU matmul
        over coarse_dim B/row plus a tiny gather — none of the per-chunk
        one-hot decode temps that make the exhaustive ADC scan fixed-cost
        heavy at serving batch sizes (keep_codes=False, as in `ivfpq.py`).

    Optional exact re-rank ("refine", parity: faiss `RFlat`/`Refine(SQ8)`):
    `refine_codes` keeps raw rows (int8 when `refine_scale` is set, else
    bf16/f32); the ADC top (k_factor * k) candidates are exactly rescored
    before the final top-k. This is the standard fix for PQ code distortion
    reordering near-tied neighbors (reference default `OPQ32_512,IVFauto,PQ32x8`
    has the same distortion — faiss users add `RFlat` for the last few points
    of recall@10).
    """

    codebooks: jax.Array  # [M, n_codes, dsub] f32 (n_codes = 1 << code_bits)
    # [N, M] uint8, or [N, M//2] nibble-packed when code_bits=4; None =
    # coarse→refine direct mode (keep_codes=False)
    codes: typ.Optional[jax.Array]
    coarse_codes: typ.Optional[jax.Array] = None  # [N, dc] int8 (None = exhaustive ADC)
    coarse_scale: typ.Optional[jax.Array] = None  # [1, dc] f32
    proj: typ.Optional[jax.Array] = None  # [D, dc] f32 (PCA projection, coarse stage)
    rotation: typ.Optional[jax.Array] = None  # [D, D] OPQ rotation (None = identity)
    subset_ids: typ.Optional[jax.Array] = None  # [N] int32
    refine_codes: typ.Optional[jax.Array] = None  # [N, D or refine_dim] rerank rows
    refine_scale: typ.Optional[jax.Array] = None  # [1, R] f32 when refine is int8
    refine_proj: typ.Optional[jax.Array] = None  # [D, refine_dim] PCA (None = raw rows)
    n_real: int = struct.field(pytree_node=False, default=0)
    offset: int = struct.field(pytree_node=False, default=0)
    n_candidates: int = struct.field(pytree_node=False, default=1024)
    approx_recall: typ.Optional[float] = struct.field(pytree_node=False, default=0.95)
    k_factor: int = struct.field(pytree_node=False, default=4)  # refine pool = k_factor*k
    # 8 = classic PQ{M}x8; 4 = fast-scan PQ{M}x4 (16-entry codebooks, codes
    # nibble-packed two-per-byte — parity: faiss `PQ{M}x4fs`). The 4-bit
    # one-hot decode temp is 16x smaller, which is the 8-bit scan's HBM wall.
    code_bits: int = struct.field(pytree_node=False, default=8)
    # "fused" routes the COARSE stage through the Pallas matmul+binned-top-k
    # kernel (ops/mips_pallas.py) — the serving-codec win: at B=64 the scan
    # path's per-chunk score traffic ~doubles the coarse-store read. Falls
    # back to the scan when a subset filter is active, exact selection is
    # requested, or the padded row count doesn't tile. Only the coarse stage
    # routes (exhaustive-ADC scans decode per chunk; no fused decode kernel).
    kernel: str = struct.field(pytree_node=False, default="scan")
    fused_bins: int = struct.field(pytree_node=False, default=512)
    fused_qblock: int = struct.field(pytree_node=False, default=2048)
    # corpus-tile rows per kernel step; 0 = auto (max(1024, fused_bins)).
    # Small-batch serving wants LARGE tiles: measured at 8.8M x 128 int8,
    # B=64, bins=2048 — tile 2048: ~2.3 ms/block vs tile 16384: ~1.2 ms
    # (~890 GB/s, the HBM read roofline; more rows per grid step amortize
    # the per-step selection + DMA turnaround).
    fused_tile: int = struct.field(pytree_node=False, default=0)


def _pad_rows(x: jax.Array, multiple: int) -> jax.Array:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _auto_pad_multiple(n: int, requested: typ.Optional[int]) -> int:
    """Row-padding granularity: 128 for small corpora (one chunk), 8192 for large
    ones so the chunked scan always finds a well-sized divisor chunk (a prime-ish
    row count would otherwise degrade the scan to 128-row chunks)."""
    if requested is not None:
        return requested
    return 128 if n <= 131072 else 8192


def build_dense_index(
    vectors: jax.Array,
    *,
    subset_ids: typ.Optional[jax.Array] = None,
    dtype: str = "bfloat16",
    offset: int = 0,
    pad_multiple: typ.Optional[int] = None,
    approx_recall: typ.Optional[float] = 0.95,
    kernel: str = "scan",
    refine: str = "none",
    k_factor: int = 4,
) -> DenseIndex:
    """Build a flat index (parity: faiss `Flat` / `build.py:12`).

    dtype: 'float32' | 'bfloat16' | 'int8'. Rows are padded to a multiple of 128
    so chunked scans tile cleanly on the MXU; padded rows score -inf via n_real.
    kernel='fused' selects the Pallas fused matmul+top-k path (flat bf16/f32
    only; rows padded to the kernel's 1024-row tile).
    refine='float32' additionally keeps exact f32 rows: the bf16/int8 scan (or
    fused kernel) selects k_factor*top_k candidates and a tiny gather+matmul
    restores exact f32 ordering (faiss `Flat,RFlat` analogue — fixes the
    ~1.1pp recall@10 that bf16 score rounding costs vs f32 ground truth).
    """
    n_real = int(vectors.shape[0])
    if kernel == "fused":
        pad_multiple = max(pad_multiple or 0, 1024)
    pad_multiple = _auto_pad_multiple(n_real, pad_multiple)
    vectors = _pad_rows(vectors, pad_multiple)
    if subset_ids is not None:
        subset_ids = _pad_rows(subset_ids.astype(jnp.int32)[:, None], pad_multiple)[:, 0]
    refine_rows = None
    if refine == "float32":
        refine_rows = vectors.astype(jnp.float32)
    elif refine != "none":
        raise ValueError(f"flat refine must be 'none' or 'float32', got {refine!r}")
    scale = None
    if dtype == "int8":
        codes, scale = pq_ops.quantize_int8(vectors.astype(jnp.float32), axis=0)
        vectors = codes
    else:
        vectors = vectors.astype(jnp.dtype(dtype))
    return DenseIndex(
        vectors=vectors, scale=scale, subset_ids=subset_ids, n_real=n_real,
        offset=offset, approx_recall=approx_recall, kernel=kernel,
        refine_rows=refine_rows, k_factor=k_factor,
    )


def _build_refine(
    vectors: jax.Array,
    refine: str,
    pad_multiple: int,
    refine_dim: typ.Optional[int] = None,
    train: typ.Optional[jax.Array] = None,
) -> tuple[typ.Optional[jax.Array], typ.Optional[jax.Array], typ.Optional[jax.Array]]:
    """Rerank-row storage (faiss Refine parity). Returns (codes, scale, proj).

    refine_dim projects rows onto the top `refine_dim` PCA directions before
    int8 quantization — real embedding spectra concentrate (>99% variance in
    the top third of dims), so a truncated-projection refine keeps most of the
    exact-rescore benefit at refine_dim/D of the memory. The projection is
    orthonormal, so projected inner products approximate raw ones directly.
    """
    if refine == "none":
        return None, None, None
    x = _pad_rows(vectors.astype(jnp.float32), pad_multiple)
    proj = None
    if refine_dim is not None and refine_dim < x.shape[-1]:
        proj, _mean = pq_ops.train_projection(train if train is not None else vectors, refine_dim)
        x = x @ proj
    if refine == "int8":
        codes, scale = pq_ops.quantize_int8(x, axis=0)
        return codes, scale, proj
    if refine in ("bfloat16", "float32"):
        return x.astype(jnp.dtype(refine)), None, proj
    raise ValueError(f"unknown refine codec {refine!r}")


def build_pq_index(
    rng: jax.Array,
    vectors: jax.Array,
    *,
    n_subquantizers: int = 32,
    coarse_dim: typ.Optional[int] = 32,
    n_candidates: int = 1024,
    train_size: typ.Optional[int] = None,
    kmeans_iters: int = 10,
    use_opq: bool = False,
    opq_iters: int = 4,
    refine: str = "none",
    refine_dim: typ.Optional[int] = None,
    k_factor: int = 4,
    subset_ids: typ.Optional[jax.Array] = None,
    offset: int = 0,
    pad_multiple: typ.Optional[int] = None,
    approx_recall: typ.Optional[float] = 0.95,
    code_bits: int = 8,
    aniso_eta: pq_ops.AnisoEta = None,
    keep_codes: bool = True,
    kernel: str = "scan",
    fused_bins: int = 512,
    fused_tile: int = 0,
) -> PQIndex:
    """Build a PQ index (parity: faiss `OPQ{M}_{d},IVFauto,PQ{M}x8[,RFlat]`;
    code_bits=4 is the fast-scan `PQ{M}x4fs` codec — 16-entry codebooks,
    nibble-packed codes at M/2 bytes/vector).

    coarse_dim=None builds the EXHAUSTIVE-ADC index (M bytes/vector, no coarse
    stage, no candidate-recall loss); an int coarse_dim adds the int8 coarse
    scan (+coarse_dim B/vector) for cheaper candidate generation at large N.
    refine='int8'|'bfloat16'|'float32' stores raw rows for exact re-ranking of
    the ADC top (k_factor * k).

    `keep_codes=False` (requires coarse_dim + refine) skips PQ training and
    drops the codes entirely: the coarse scan's top k_factor*k feed the exact
    re-rank directly — the serving codec (see PQIndex docstring).

    CAUTION: size `coarse_dim` to the data's spectrum. The coarse PCA filter
    works because real embedding matrices concentrate variance in the top
    directions; on near-isotropic vectors a small coarse_dim keeps ~coarse_dim/d
    of the variance and candidate recall collapses (measured: 32/768 on i.i.d.
    gaussians -> recall@10 0.009 — faiss PQ32 degrades identically there).
    Rule of thumb: coarse_dim >= the #components covering ~60% variance.
    """
    n_real = int(vectors.shape[0])
    if code_bits not in (8, 4):
        raise ValueError(f"code_bits must be 8 or 4, got {code_bits}")
    if code_bits == 4 and n_subquantizers % 2:
        raise ValueError("code_bits=4 requires an even n_subquantizers (nibble packing)")
    if not keep_codes and (coarse_dim is None or refine == "none"):
        raise ValueError("keep_codes=False requires coarse_dim and a refine store")
    n_codes = 1 << code_bits
    pad_multiple = _auto_pad_multiple(n_real, pad_multiple)
    x = vectors.astype(jnp.float32)
    train = x if train_size is None or train_size >= n_real else x[:train_size]

    if keep_codes:
        # OPQ rotation balances subspace energies (faiss OPQ{M}_{d} parity);
        # aniso_eta switches to the score-aware ScaNN objective (beyond faiss)
        rotation, codebooks, aniso_resolved = pq_ops.train_pq_codebooks(
            rng, train, n_subquantizers, n_codes=n_codes, kmeans_iters=kmeans_iters,
            use_opq=use_opq, opq_iters=opq_iters, aniso_eta=aniso_eta,
        )
    else:
        rotation, codebooks, aniso_resolved = None, jnp.zeros((1, 1, 1), jnp.float32), None
    x_rot = x if rotation is None else x @ rotation
    train_rot = train if rotation is None else train @ rotation

    coarse_codes = coarse_scale = proj = None
    if coarse_dim is not None:
        proj, mean = pq_ops.train_projection(train_rot, coarse_dim)
        # Fold the mean into nothing: MIPS is shift-sensitive, so project WITHOUT
        # centering (PCA directions still concentrate energy).
        coarse = x_rot @ proj  # [n, dc]
        coarse_codes, coarse_scale = pq_ops.quantize_int8(coarse, axis=0)
        coarse_codes = _pad_rows(coarse_codes, pad_multiple)

    codes = None
    if keep_codes:
        codes = pq_ops.encode_pq_auto(codebooks, x_rot, eta=aniso_resolved)
        if code_bits == 4:
            codes = _pack_codes4(codes)
        codes = _pad_rows(codes, pad_multiple)
    refine_codes, refine_scale, refine_proj = _build_refine(
        x, refine, pad_multiple, refine_dim=refine_dim, train=train
    )
    if subset_ids is not None:
        subset_ids = _pad_rows(subset_ids.astype(jnp.int32)[:, None], pad_multiple)[:, 0]
    return PQIndex(
        codebooks=codebooks,
        codes=codes,
        coarse_codes=coarse_codes,
        coarse_scale=coarse_scale,
        proj=proj,
        rotation=rotation,
        subset_ids=subset_ids,
        refine_codes=refine_codes,
        refine_scale=refine_scale,
        refine_proj=refine_proj,
        n_real=n_real,
        offset=offset,
        n_candidates=n_candidates,
        approx_recall=approx_recall,
        k_factor=k_factor,
        code_bits=code_bits,
        kernel=kernel,
        fused_bins=fused_bins,
        fused_tile=fused_tile,
    )


def _scan_topk(
    score_chunk_fn: typ.Callable[[jax.Array], jax.Array],  # chunk_start -> [B, chunk]
    n_rows: int,
    n_real: int,
    batch: int,
    top_k: int,
    chunk: int,
    dtype=jnp.float32,
    approx_recall: typ.Optional[float] = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """Streaming top-k over corpus chunks: scan with a running (scores, ids) carry.

    Per-chunk selection uses the TPU's hardware-accelerated `approx_max_k`
    (PartialReduce) by default — measured on v5e at 1M x 768, B=2048: exact
    lax.top_k costs 83 ms of a 124 ms scan; approx_max_k(0.95) cuts the scan to
    48 ms with measured recall 1.000 vs exact for k=10 (bin collisions are
    vanishingly rare at these widths). Pass `approx_recall=None` for exact
    selection (faiss `Flat` exactness parity). CPU backends fall back to exact.
    """
    n_chunks = n_rows // chunk
    init = (
        jnp.full((batch, top_k), -jnp.inf, dtype=dtype),
        jnp.full((batch, top_k), -1, dtype=jnp.int32),
    )

    def body(carry, ci):
        top_s, top_i = carry
        start = ci * chunk
        s = score_chunk_fn(start)  # [B, chunk]
        row_ids = start + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        s = jnp.where(row_ids < n_real, s, -jnp.inf)
        if approx_recall is not None:
            c_s, c_pos = jax.lax.approx_max_k(s, top_k, recall_target=approx_recall)
        else:
            # NOTE: measured on v5e, full-width lax.top_k beats a two-stage
            # block top-k (the reshape/relayout costs more than it saves).
            c_s, c_pos = jax.lax.top_k(s, top_k)
        c_i = start + c_pos.astype(jnp.int32)
        all_s = jnp.concatenate([top_s, c_s], axis=-1)
        all_i = jnp.concatenate([top_i, c_i], axis=-1)
        new_s, pos = jax.lax.top_k(all_s, top_k)
        new_i = jnp.take_along_axis(all_i, pos, axis=-1)
        return (new_s, new_i), None

    (top_s, top_i), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return top_s, top_i


def _scan_collect_topk(
    score_chunk_fn: typ.Callable[[jax.Array], jax.Array],
    n_rows: int,
    n_real: int,
    batch: int,
    top_k: int,
    chunk: int,
    per_chunk_k: typ.Optional[int] = None,
    approx_recall: typ.Optional[float] = 0.95,
    concentrated: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Candidate selection for LARGE k (e.g. the PQ coarse stage's thousands of
    candidates): a running top-k carry would re-sort a k-wide buffer per chunk
    (measured 6 s/query-batch at 8.8M with k=8192). Instead: per-chunk keep a
    PROPORTIONAL share (oversampled ~2x), stack, and do ONE final top-k — the
    standard distributed-top-k approximation (each global winner is almost
    surely in its chunk's proportional top share).

    `concentrated=True` (callers set it when subset/shard filtering is active,
    i.e. finite scores may all live in ONE chunk of a dataset-contiguous
    corpus) and exact mode (`approx_recall=None`) both force the lossless
    `per_chunk_k = top_k`: the proportional-share argument assumes winners
    spread ~Poisson across chunks, which filtering violates."""
    n_chunks = n_rows // chunk
    if per_chunk_k is None:
        if concentrated or approx_recall is None:
            per_chunk_k = min(chunk, top_k)
        else:
            # 4x proportional oversampling, floor 32: for a random row layout
            # the per-chunk share of the global top-k is ~Poisson(k/n_chunks),
            # so 32 is already vanishingly unlikely to truncate a winner. (The
            # old floor of 128 made a 160-wide pool over 540 chunks collect
            # 69k candidates — 800 QPS at 8.8M; floor 32 keeps it ~17k.)
            per_chunk_k = min(chunk, max(32, -(-4 * top_k // n_chunks)))

    def body(_, ci):
        start = ci * chunk
        s = score_chunk_fn(start)
        row_ids = start + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        s = jnp.where(row_ids < n_real, s, -jnp.inf)
        if approx_recall is not None:
            c_s, c_pos = jax.lax.approx_max_k(s, per_chunk_k, recall_target=approx_recall)
        else:
            c_s, c_pos = jax.lax.top_k(s, per_chunk_k)
        return None, (c_s, start + c_pos.astype(jnp.int32))

    _, (all_s, all_i) = jax.lax.scan(body, None, jnp.arange(n_chunks))
    all_s = jnp.moveaxis(all_s, 0, 1).reshape(batch, n_chunks * per_chunk_k)
    all_i = jnp.moveaxis(all_i, 0, 1).reshape(batch, n_chunks * per_chunk_k)
    k_eff = min(top_k, all_s.shape[-1])
    top_s, pos = jax.lax.top_k(all_s, k_eff)
    top_i = jnp.take_along_axis(all_i, pos, axis=-1)
    if k_eff < top_k:
        pad = top_k - k_eff
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        top_i = jnp.pad(top_i, ((0, 0), (0, pad)), constant_values=-1)
    return top_s, jnp.where(jnp.isfinite(top_s), top_i, -1)


_FROM_INDEX = "from_index"  # sentinel: take approx_recall from the index config


def dense_search(
    index: DenseIndex,
    queries: SearchQueries,
    top_k: int,
    *,
    chunk: int = 131072,
    approx_recall: typ.Any = _FROM_INDEX,
) -> RetrievalBatch:
    """Exhaustive MIPS over a flat index with optional subset filtering.

    Parity: faiss `/fast-search` (`faiss_search/server.py:77`) + ES-style subset
    `terms` filtering — one fused XLA program, no HTTP, no host round-trip.
    """
    if approx_recall is _FROM_INDEX:
        approx_recall = index.approx_recall
    q = queries.vector
    if q is None:
        raise ValueError("dense_search requires queries.vector")
    b, d = q.shape
    n = index.vectors.shape[0]
    chunk = min(chunk, n)
    if n % chunk != 0:
        # fall back to a divisor-friendly chunk (rows are padded to 128s)
        chunk = n if n <= 131072 else 128 * (n // 128 // max(1, n // 131072))
        while n % chunk != 0:
            chunk -= 128
    allowed = queries.subset_ids

    # exact-f32 refine: the scan/kernel selects a k_factor*k candidate pool;
    # `_finish` rescores it from the f32 rows and cuts back to top_k
    refine = index.refine_rows is not None
    sel_k = min(index.k_factor * top_k, n) if refine else top_k

    def _finish(top_s: jax.Array, top_i: jax.Array) -> RetrievalBatch:
        if refine:
            top_s, top_i = _flat_refine_rerank(index, q, top_s, top_i, top_k)
        top_i = jnp.where(top_i >= 0, top_i + index.offset, top_i)
        return RetrievalBatch(scores=top_s, indices=top_i)
    if index.scale is not None:
        # int8 codec: fold the per-dim corpus scale into the query, then
        # quantize the query per-row so the matmul runs on the int8 MXU path
        # (2x the bf16 rate); the row scale factors back out of the int32
        # accumulator. score = qs_row * (q_i8 . codes_n) (qdrant scalar-quant
        # parity with on-chip integer arithmetic).
        q_f = q.astype(jnp.float32) * index.scale  # [B, D]
        q_absmax = jnp.max(jnp.abs(q_f), axis=-1, keepdims=True)
        q_row_scale = jnp.maximum(q_absmax, 1e-8) / 127.0
        q_i8 = jnp.clip(jnp.round(q_f / q_row_scale), -127, 127).astype(jnp.int8)

        if index.kernel == "fused" and allowed is None and approx_recall is not None:
            # int8 fused kernel: int32 accumulation end-to-end; the positive
            # per-row query scale preserves ordering, applied post-kernel.
            # approx_recall=None (exactness requested) stays on the scan path —
            # the binned kernel is inherently approximate.
            from vod_tpu.ops.mips_pallas import fused_mips_binned

            b_pad = (-b) % 16
            q_k = jnp.pad(q_i8, ((0, b_pad), (0, 0))) if b_pad else q_i8
            top_s, top_i = fused_mips_binned(
                index.vectors, q_k, k=min(sel_k, index.fused_bins),
                n_real=index.n_real,
                bins=index.fused_bins, qblock=index.fused_qblock,
                interpret=jax.default_backend() == "cpu",
            )
            top_s = top_s[:b].astype(jnp.float32) * q_row_scale
            top_i = top_i[:b]
            top_s = jnp.where(top_i >= 0, top_s, -jnp.inf)
            return _finish(top_s, top_i)

        def score_chunk(start: jax.Array) -> jax.Array:
            v = jax.lax.dynamic_slice_in_dim(index.vectors, start, chunk, axis=0)
            acc = jax.lax.dot_general(
                q_i8, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            s = acc.astype(jnp.float32) * q_row_scale
            if allowed is not None and index.subset_ids is not None:
                sub = jax.lax.dynamic_slice_in_dim(index.subset_ids, start, chunk, axis=0)
                match = sub[None, None, :] == allowed[:, :, None]
                ok = jnp.any(match, axis=1) | jnp.all(allowed < 0, axis=-1, keepdims=True)
                s = jnp.where(ok, s, -jnp.inf)
            return s

        top_s, top_i = _scan_topk(
            score_chunk, n, index.n_real, b, sel_k, chunk, approx_recall=approx_recall
        )
        return _finish(top_s, top_i)

    q_eff = q.astype(index.vectors.dtype)

    if index.kernel == "fused" and allowed is None and approx_recall is not None:
        # Pallas fused matmul + binned streaming top-k (ops/mips_pallas.py):
        # scores never leave VMEM. Subset filtering and exactness requests
        # (approx_recall=None) stay on the scan path.
        from vod_tpu.ops.mips_pallas import fused_mips_binned

        b_pad = (-b) % 16  # sublane-align the query block
        q_k = jnp.pad(q_eff, ((0, b_pad), (0, 0))) if b_pad else q_eff
        top_s, top_i = fused_mips_binned(
            index.vectors, q_k, k=min(sel_k, index.fused_bins),
            n_real=index.n_real,
            bins=index.fused_bins, qblock=index.fused_qblock,
            interpret=jax.default_backend() == "cpu",
        )
        top_s, top_i = top_s[:b], top_i[:b]
        return _finish(top_s, top_i)

    def score_chunk(start: jax.Array) -> jax.Array:
        v = jax.lax.dynamic_slice_in_dim(index.vectors, start, chunk, axis=0)
        s = jnp.dot(q_eff, v.T.astype(q_eff.dtype), preferred_element_type=jnp.float32)
        if allowed is not None and index.subset_ids is not None:
            sub = jax.lax.dynamic_slice_in_dim(index.subset_ids, start, chunk, axis=0)
            match = sub[None, None, :] == allowed[:, :, None]
            ok = jnp.any(match, axis=1) | jnp.all(allowed < 0, axis=-1, keepdims=True)
            s = jnp.where(ok, s, -jnp.inf)
        return s

    top_s, top_i = _scan_topk(
        score_chunk, n, index.n_real, b, sel_k, chunk, approx_recall=approx_recall
    )
    return _finish(top_s, top_i)


def _flat_refine_rerank(
    index: DenseIndex, q: jax.Array, cand_s: jax.Array, cand_i: jax.Array, top_k: int
) -> tuple[jax.Array, jax.Array]:
    """Exact-f32 rescore of the scan/kernel candidate pool (faiss `Flat,RFlat`
    analogue): gather the candidates' f32 rows (tiny — k_factor*k rows/query vs
    the N-row scan) and re-order by a HIGHEST-precision matmul. Candidates the
    first stage filtered (-inf score: subset mask, row padding) or never filled
    (id -1) stay excluded."""
    valid = jnp.isfinite(cand_s) & (cand_i >= 0)
    rows = jnp.take(index.refine_rows, jnp.maximum(cand_i, 0), axis=0)  # [B, K, D]
    s = jnp.einsum(
        "bd,bkd->bk", q.astype(jnp.float32), rows,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    s = jnp.where(valid, s, -jnp.inf)
    k_eff = min(top_k, s.shape[-1])
    new_s, pos = jax.lax.top_k(s, k_eff)
    new_i = jnp.take_along_axis(cand_i, pos, axis=-1)
    if k_eff < top_k:
        pad = top_k - k_eff
        new_s = jnp.pad(new_s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        new_i = jnp.pad(new_i, ((0, 0), (0, pad)), constant_values=-1)
    return new_s, jnp.where(jnp.isfinite(new_s), new_i, -1)


_PQ_RESCORE_ELEMS = 1 << 27  # ~512MB f32 rescore gather cap


def decode_rows(
    codebooks: jax.Array, codes: jax.Array, dtype=jnp.float32, *, onehot: bool = False
) -> jax.Array:
    """Reconstruct a block of rows from PQ codes: [c, M] uint8 -> [c, d].

    Two equivalent implementations (identical results — one-hot selection is
    exact, and summing the 255 zero terms is a no-op at any dtype):

      * gather — one flat lookup into the (tiny) codebook table;
      * onehot — `onehot(codes) @ codebooks` on the MXU. The decode gather is
        the measured exhaustive-ADC bottleneck at 8.8M (QPS tracks lookups,
        not FLOPs: m=64 1.66k vs m=128 0.9k); the one-hot matmul trades ~12%
        extra FLOPs for zero gathers — 2.9k vs 1.66k QPS at 8.8M x pq64 bf16.

    Feeds the exhaustive-ADC matmul (q . decode(codes) == the ADC LUT sum).
    """
    m, k, dsub = codebooks.shape
    if onehot:
        iota = jnp.arange(k, dtype=jnp.int32)
        oh = (codes.astype(jnp.int32)[:, :, None] == iota[None, None, :]).astype(dtype)
        dec = jnp.einsum(
            "cmk,mkd->cmd", oh, codebooks.astype(dtype), preferred_element_type=dtype
        )
        return dec.reshape(codes.shape[0], m * dsub)
    flat = codebooks.reshape(m * k, dsub).astype(dtype)
    idx = codes.astype(jnp.int32) + (jnp.arange(m, dtype=jnp.int32) * k)[None, :]
    return flat[idx].reshape(codes.shape[0], m * dsub)


def _pack_codes4(codes: jax.Array) -> jax.Array:
    """Nibble-pack 4-bit PQ codes two-per-byte: [..., M] (values < 16) -> [..., M//2]."""
    lo = codes[..., 0::2].astype(jnp.uint8)
    hi = codes[..., 1::2].astype(jnp.uint8)
    return lo | (hi << 4)


def _unpack_codes4(packed: jax.Array) -> jax.Array:
    """Inverse of `_pack_codes4`: [..., M//2] -> [..., M] (values < 16)."""
    lo = packed & jnp.uint8(15)
    hi = packed >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


def _int8_adc_scan_inputs(
    codebooks: jax.Array, q_eff: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Prepare the int8 exhaustive-ADC scan: per-subspace-quantized codebooks
    and row-quantized queries with the codebook scale folded in.

    Because a one-hot matmul SELECTS codebook entries, `onehot_i8 @ cb_i8`
    reproduces the int8-quantized codebook exactly; the only approximation is
    the per-subspace codebook quantization plus the per-row query
    quantization (<1% — erased by the exact refine stage this path requires).
    Returns (cb_i8 [M,256,dsub], q_i8 [B,D], q_row_scale [B,1])."""
    cb_absmax = jnp.max(jnp.abs(codebooks), axis=(1, 2), keepdims=True)
    cb_scale = jnp.maximum(cb_absmax, 1e-8) / 127.0
    cb_i8 = jnp.clip(jnp.round(codebooks / cb_scale), -127, 127).astype(jnp.int8)
    scale_vec = jnp.repeat(cb_scale[:, 0, 0], codebooks.shape[-1])
    q_f = q_eff.astype(jnp.float32) * scale_vec
    q_row = jnp.maximum(jnp.max(jnp.abs(q_f), axis=-1, keepdims=True), 1e-8) / 127.0
    q_i8 = jnp.clip(jnp.round(q_f / q_row), -127, 127).astype(jnp.int8)
    return cb_i8, q_i8, q_row


def _int8_onehot_adc_chunk(
    cb_i8: jax.Array, q_i8: jax.Array, q_row: jax.Array, c: jax.Array
) -> jax.Array:
    """Score one code chunk: int8 one-hot decode (MXU, gather-free) + int8
    matmul with int32 accumulation; scores rescaled to f32. `c` must be
    UNPACKED codes [chunk, M] with values < cb_i8.shape[1]."""
    iota = jnp.arange(cb_i8.shape[1], dtype=jnp.int32)
    oh = (c.astype(jnp.int32)[:, :, None] == iota[None, None, :]).astype(jnp.int8)
    dec = jnp.einsum("cmk,mkd->cmd", oh, cb_i8, preferred_element_type=jnp.int32)
    dec = dec.reshape(c.shape[0], -1).astype(jnp.int8)  # values are int8-ranged
    acc = jax.lax.dot_general(
        q_i8, dec, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * q_row


def _refine_rerank(
    index: PQIndex, q_orig: jax.Array, cand_s: jax.Array, cand_i: jax.Array, top_k: int
) -> tuple[jax.Array, jax.Array]:
    """Exact re-rank of ADC candidates against raw rows (faiss Refine parity).

    cand_i are LOCAL row ids (offset not yet applied). Gathers [B, K, D] raw
    rows — K = k_factor * top_k, so the gather is tiny relative to the scan.
    """
    n = index.refine_codes.shape[0]
    safe = jnp.clip(cand_i, 0, n - 1)
    raw = index.refine_codes[safe]  # [B, K, R]
    if index.refine_proj is not None:  # truncated-PCA refine: project queries
        q_orig = q_orig.astype(jnp.float32) @ index.refine_proj
    if index.refine_scale is not None:  # int8 raw: fold per-dim scale into q
        q_eff = q_orig.astype(jnp.float32) * index.refine_scale
        exact = jnp.einsum(
            "bd,bkd->bk", q_eff, raw.astype(jnp.float32), preferred_element_type=jnp.float32
        )
    else:
        exact = jnp.einsum(
            "bd,bkd->bk", q_orig.astype(raw.dtype), raw, preferred_element_type=jnp.float32
        )
    exact = jnp.where(jnp.isfinite(cand_s), exact, -jnp.inf)
    top_s, pos = jax.lax.top_k(exact, top_k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=-1)
    return top_s, top_i


def pq_search(
    index: PQIndex,
    queries: SearchQueries,
    top_k: int,
    *,
    chunk: int = 131072,
    approx_recall: typ.Any = _FROM_INDEX,
) -> RetrievalBatch:
    """PQ search: exhaustive ADC (decode-matmul scan) or coarse scan + ADC
    rescore, then optional exact re-rank of the top k_factor*k candidates."""
    if approx_recall is _FROM_INDEX:
        approx_recall = index.approx_recall
    q = queries.vector
    if q is None:
        raise ValueError("pq_search requires queries.vector")
    b, d = q.shape
    exhaustive = index.coarse_codes is None
    do_refine = index.refine_codes is not None
    direct = index.codes is None  # coarse→refine, no ADC stage (keep_codes=False)
    if direct and (exhaustive or not do_refine):
        raise ValueError("PQIndex built with keep_codes=False requires coarse + refine stores")
    n = (index.coarse_codes if direct else index.codes).shape[0]
    if exhaustive:
        if do_refine and index.code_bits == 8:
            # int8 one-hot decode path: [chunk, M, 256] int8 temp (512MB at
            # 32768 x 64); measured fastest at 8.8M (see
            # examples/pq_decode_variants_bench.py: 4728 QPS vs 2878 at 8192
            # bf16, identical recall)
            chunk = min(chunk, 32768)
        elif do_refine:
            # 4-bit one-hot temp is 16x smaller ([chunk, M, 16] = 128MB at
            # 65536 x 128); measured optimum at 8.8M (131072 was ~4% slower)
            chunk = min(chunk, 65536)
        else:
            # gather-decode path: bound the decoded [chunk, d] HBM temp
            # (~96MB bf16 at 65536 x 768)
            chunk = min(chunk, 65536)
    chunk = min(chunk, n)
    while n % chunk != 0:
        chunk -= 128
    n_cand = min(index.n_candidates, n)
    n_pool = min(index.k_factor * top_k, n) if do_refine else top_k

    # The ADC rescore gathers a [B, n_cand, M] f32 block and the refine stage a
    # [B, n_pool, D] block; cap the total at ~512MB by mapping over query
    # chunks (measured: B=4096 x n_cand=4096 x M=32 asked XLA for an 8GB temp
    # and OOMed HBM).
    m_sub = index.codebooks.shape[0]
    r_dim = index.refine_codes.shape[-1] if do_refine else 0
    per_q = (n_cand * m_sub if not (exhaustive or direct) else 0) + n_pool * r_dim
    qchunk = max(8, _PQ_RESCORE_ELEMS // max(1, per_q))
    if b > qchunk:
        pad = (-b) % qchunk
        qp = jnp.pad(q, ((0, pad), (0, 0))) if pad else q
        sub = queries.subset_ids
        subp = None
        if sub is not None:
            subp = jnp.pad(sub, ((0, pad), (0, 0)), constant_values=-1) if pad else sub
            subp = subp.reshape((b + pad) // qchunk, qchunk, -1)

        def one(args):
            vec, ss = args
            return pq_search(
                index, SearchQueries(vector=vec, subset_ids=ss), top_k,
                chunk=chunk, approx_recall=approx_recall,
            )

        out = jax.lax.map(one, (qp.reshape((b + pad) // qchunk, qchunk, d), subp))
        return RetrievalBatch(
            scores=out.scores.reshape(b + pad, top_k)[:b],
            indices=out.indices.reshape(b + pad, top_k)[:b],
        )

    q_eff = q.astype(jnp.float32)
    if index.rotation is not None:  # OPQ: rotate queries into codebook space
        q_eff = q_eff @ index.rotation
    allowed = queries.subset_ids
    # subset filtering can concentrate every finite score into one chunk of a
    # dataset-contiguous corpus — proportional candidate collection must not
    # truncate there (see _scan_collect_topk)
    filtered = allowed is not None and index.subset_ids is not None

    def _mask_chunk(s: jax.Array, start: jax.Array) -> jax.Array:
        if allowed is not None and index.subset_ids is not None:
            sub = jax.lax.dynamic_slice_in_dim(index.subset_ids, start, chunk, axis=0)
            match = sub[None, None, :] == allowed[:, :, None]
            ok = jnp.any(match, axis=1) | jnp.all(allowed < 0, axis=-1, keepdims=True)
            s = jnp.where(ok, s, -jnp.inf)
        return s

    if exhaustive:
        # Exhaustive ADC == q_rot . decode(codes): a streaming decode+matmul
        # scan with NO candidate-recall loss. With a refine stage fixing the
        # final order, the whole scan runs int8 (one-hot MXU decode + int8
        # matmul with the codebook scale folded into the query): the one-hot
        # temp halves and both matmuls run at 2x the bf16 MXU rate — 4728 vs
        # 1641 QPS at 8.8M x pq64, identical recall (the <1% codebook
        # quantization error is erased by the exact re-rank). Without refine
        # the ADC order is final: f32 gather decode.
        unpack = _unpack_codes4 if index.code_bits == 4 else (lambda c: c)
        if do_refine:
            cb_i8, q_i8, q_row = _int8_adc_scan_inputs(index.codebooks, q_eff)

            def score_chunk(start: jax.Array) -> jax.Array:
                c = unpack(jax.lax.dynamic_slice_in_dim(index.codes, start, chunk, axis=0))
                return _mask_chunk(_int8_onehot_adc_chunk(cb_i8, q_i8, q_row, c), start)
        else:
            q_mm = q_eff.astype(jnp.float32)

            def score_chunk(start: jax.Array) -> jax.Array:
                c = unpack(jax.lax.dynamic_slice_in_dim(index.codes, start, chunk, axis=0))
                dec = decode_rows(index.codebooks, c, dtype=jnp.float32)  # [chunk, d]
                s = jnp.dot(q_mm, dec.T, preferred_element_type=jnp.float32)
                return _mask_chunk(s, start)

        if approx_recall is not None and n_pool > 64:
            # wide refine pools: a running n_pool-wide carry re-sorts 2*n_pool
            # per chunk and dominates the scan (measured: pool 320 dropped the
            # 200k exhaustive scan from 266k to 6k QPS). Proportional per-chunk
            # collection + ONE final top-k is the cheap way to a large pool.
            pool_s, pool_i = _scan_collect_topk(
                score_chunk, n, index.n_real, b, n_pool, chunk,
                approx_recall=approx_recall, concentrated=filtered,
            )
        else:
            pool_s, pool_i = _scan_topk(
                score_chunk, n, index.n_real, b, n_pool, chunk, approx_recall=approx_recall
            )
    else:
        # Stage 1: coarse scores over all rows via the projected int8 corpus.
        # The coarse query is row-quantized to int8 so the scan runs on the
        # int8 MXU path (2x the bf16 rate); the positive per-row scale
        # preserves ordering and factors back out of the int32 accumulator.
        q_proj = (q_eff @ index.proj) * index.coarse_scale  # [B, dc]
        q_cr = jnp.maximum(jnp.max(jnp.abs(q_proj), axis=-1, keepdims=True), 1e-8) / 127.0
        q_ci8 = jnp.clip(jnp.round(q_proj / q_cr), -127, 127).astype(jnp.int8)

        def score_chunk(start: jax.Array) -> jax.Array:
            v = jax.lax.dynamic_slice_in_dim(index.coarse_codes, start, chunk, axis=0)
            acc = jax.lax.dot_general(
                q_ci8, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            return _mask_chunk(acc.astype(jnp.float32) * q_cr, start)

        # coarse→refine direct: the scan's top pool feeds the re-rank with no
        # ADC stage in between (candidate pool = k_factor * top_k)
        n_stage1 = n_pool if direct else n_cand
        # Pallas fused matmul+binned-top-k over the coarse store: the int8
        # score chunks never round-trip through HBM, which is what bounds the
        # small-batch SERVING dispatch (the whole block shares ONE read of the
        # [N, dc] store; the scan path's chunk scores + approx_max_k traffic
        # roughly double it). Requirements mirror dense_search's fused route:
        # no subset filter, approximate selection allowed, and the padded row
        # count divisible by a bins-aligned tile (else fall back to the scan).
        use_fused = (
            index.kernel == "fused" and allowed is None and approx_recall is not None
        )
        if use_fused:
            f_bins = index.fused_bins
            f_tile = index.fused_tile or max(1024, f_bins)
            if n % f_tile != 0 or f_tile % f_bins != 0:
                f_tile = max(1024, f_bins)  # auto fallback before giving up
            use_fused = n % f_tile == 0 and f_tile % f_bins == 0
        if use_fused:
            from vod_tpu.ops.mips_pallas import fused_mips_binned

            b_pad = (-b) % 16  # sublane-align the query block
            q_k = jnp.pad(q_ci8, ((0, b_pad), (0, 0))) if b_pad else q_ci8
            cand_s, cand_i = fused_mips_binned(
                index.coarse_codes, q_k, k=min(n_stage1, f_bins),
                n_real=index.n_real, bins=f_bins, tile=f_tile,
                qblock=index.fused_qblock,
                interpret=jax.default_backend() == "cpu",
            )
            cand_i = cand_i[:b]
            cand_s = cand_s[:b].astype(jnp.float32) * q_cr
            cand_s = jnp.where(cand_i >= 0, cand_s, -jnp.inf)
        else:
            cand_s, cand_i = _scan_collect_topk(
                score_chunk, n, index.n_real, b, n_stage1, chunk,
                approx_recall=approx_recall, concentrated=filtered,
            )

        if direct:
            pool_s, pool_i = cand_s, cand_i
        else:
            # Stage 2: ADC rescore of the candidates (B * n_cand * M bytes gather).
            safe_i = jnp.clip(cand_i, 0, n - 1)
            cand_codes = index.codes[safe_i]  # [B, n_cand, M (or M//2 packed)]
            if index.code_bits == 4:
                cand_codes = _unpack_codes4(cand_codes)
            lut = pq_ops.adc_lut(index.codebooks, q_eff)
            adc = pq_ops.adc_score_codes(lut, cand_codes)  # [B, n_cand]
            adc = jnp.where(jnp.isfinite(cand_s), adc, -jnp.inf)
            k_pool = min(n_pool, adc.shape[-1])
            pool_s, pos = jax.lax.top_k(adc, k_pool)
            pool_i = jnp.take_along_axis(cand_i, pos, axis=-1)

    if pool_s.shape[-1] < top_k:  # tiny corpus / n_candidates < k
        pad = top_k - pool_s.shape[-1]
        pool_s = jnp.pad(pool_s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        pool_i = jnp.pad(pool_i, ((0, 0), (0, pad)), constant_values=-1)
    if do_refine:
        top_s, top_i = _refine_rerank(index, q, pool_s, pool_i, top_k)
    else:
        top_s, top_i = pool_s[:, :top_k], pool_i[:, :top_k]
    top_i = jnp.where(jnp.isfinite(top_s), top_i + index.offset, -1)
    top_s = jnp.where(jnp.isfinite(top_s), top_s, -jnp.inf)
    return RetrievalBatch(scores=top_s, indices=top_i)


@struct.dataclass
class IVFIndex:
    """IVF: k-means cells, cluster-padded slabs, nprobe probing.

    Parity: faiss `IVF{n},Flat` (`faiss_search/build.py`, `_train_ivf`,
    `build_gpu.py:103`). TPU note: cells are padded to the max cell size so
    probing is a static-shape gather; on TPU the exhaustive flat scan is
    usually faster below ~10M rows (MXU streams beat gathers) — IVF pays off
    when compute, not bandwidth, is the limit (large B, huge N).
    """

    centroids: jax.Array  # [C, D] f32
    vectors: jax.Array  # [C, S, D] cluster-padded storage
    row_ids: jax.Array  # [C, S] int32 original row ids, -1 pad
    subset_ids: typ.Optional[jax.Array] = None  # [C, S]
    nprobe: int = struct.field(pytree_node=False, default=8)
    offset: int = struct.field(pytree_node=False, default=0)


def build_ivf_index(
    rng: jax.Array,
    vectors: jax.Array,
    *,
    n_clusters: typ.Optional[int] = None,
    nprobe: int = 8,
    kmeans_iters: int = 10,
    train_size: typ.Optional[int] = None,
    dtype: str = "bfloat16",
    subset_ids: typ.Optional[jax.Array] = None,
    offset: int = 0,
) -> IVFIndex:
    """Build IVF cells (parity: `IVFauto` centroid inference, `support.py:13`)."""
    import numpy as np

    from vod_tpu.ops.kmeans import infer_n_clusters, kmeans

    n, d = vectors.shape
    c = n_clusters or infer_n_clusters(n)
    x = vectors.astype(jnp.float32)
    train = x if train_size is None or train_size >= n else x[:train_size]
    centroids, _ = kmeans(rng, train, n_clusters=c, n_iters=kmeans_iters)
    from vod_tpu.ops.kmeans import _assign_chunked

    assign = np.asarray(_assign_chunked(x, centroids))
    # host-side bucketing into padded slabs
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    counts = np.bincount(sorted_assign, minlength=c)
    s = int(max(128, ((counts.max() + 127) // 128) * 128))
    slabs = np.zeros((c, s, d), dtype=np.float32)
    row_ids = np.full((c, s), -1, dtype=np.int32)
    subs = np.full((c, s), -1, dtype=np.int32) if subset_ids is not None else None
    sub_np = None if subset_ids is None else np.asarray(subset_ids)
    x_np = np.asarray(x)
    start = 0
    for ci in range(c):
        cnt = int(counts[ci])
        rows = order[start : start + cnt]
        slabs[ci, :cnt] = x_np[rows]
        row_ids[ci, :cnt] = rows
        if subs is not None:
            subs[ci, :cnt] = sub_np[rows]
        start += cnt
    return IVFIndex(
        centroids=centroids,
        vectors=jnp.asarray(slabs, dtype=jnp.dtype(dtype)),
        row_ids=jnp.asarray(row_ids),
        subset_ids=None if subs is None else jnp.asarray(subs),
        nprobe=nprobe,
        offset=offset,
    )


def ivf_search(
    index: IVFIndex,
    queries: SearchQueries,
    top_k: int,
) -> RetrievalBatch:
    """Probe the nprobe nearest cells per query, score their slabs, top-k."""
    q = queries.vector
    if q is None:
        raise ValueError("ivf_search requires queries.vector")
    b, d = q.shape
    c, s, _ = index.vectors.shape
    nprobe = min(index.nprobe, c)

    cscores = jnp.dot(q.astype(jnp.float32), index.centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(cscores, nprobe)  # [B, P]

    allowed = queries.subset_ids

    def one_probe(p: jax.Array) -> tuple[jax.Array, jax.Array]:
        cell = probe[:, p]  # [B]
        slab = index.vectors[cell]  # [B, S, D] gather
        ids = index.row_ids[cell]  # [B, S]
        sc = jnp.einsum(
            "bd,bsd->bs", q.astype(slab.dtype), slab, preferred_element_type=jnp.float32
        )
        sc = jnp.where(ids >= 0, sc, -jnp.inf)
        if allowed is not None and index.subset_ids is not None:
            sub = index.subset_ids[cell]
            ok = jnp.any(sub[:, :, None] == allowed[:, None, :], axis=-1)
            ok = ok | jnp.all(allowed < 0, axis=-1, keepdims=True)
            sc = jnp.where(ok, sc, -jnp.inf)
        ts, tp = jax.lax.top_k(sc, min(top_k, s))
        return ts, jnp.take_along_axis(ids, tp, axis=-1)

    probe_s, probe_i = jax.lax.map(one_probe, jnp.arange(nprobe))  # [P, B, k']
    all_s = jnp.moveaxis(probe_s, 0, 1).reshape(b, -1)
    all_i = jnp.moveaxis(probe_i, 0, 1).reshape(b, -1)
    top_s, pos = jax.lax.top_k(all_s, top_k)
    top_i = jnp.take_along_axis(all_i, pos, axis=-1)
    ok = jnp.isfinite(top_s)
    top_i = jnp.where(ok, top_i + index.offset, -1)
    return RetrievalBatch(scores=jnp.where(ok, top_s, -jnp.inf), indices=top_i)


def build_pq_index_from_host(
    rng: jax.Array,
    vectors_np,  # numpy [N, D] (host RAM; may exceed HBM)
    *,
    n_subquantizers: int = 32,
    coarse_dim: typ.Optional[int] = 32,
    n_candidates: int = 1024,
    train_size: int = 500_000,
    kmeans_iters: int = 10,
    use_opq: bool = False,
    refine: str = "none",
    refine_dim: typ.Optional[int] = None,
    k_factor: int = 4,
    slab: int = 1_000_000,
    subset_ids: typ.Optional[jax.Array] = None,
    offset: int = 0,
    approx_recall: typ.Optional[float] = 0.95,
    code_bits: int = 8,
    aniso_eta: pq_ops.AnisoEta = None,
    keep_codes: bool = True,
    kernel: str = "scan",
    fused_bins: int = 512,
    fused_tile: int = 0,
) -> PQIndex:
    """PQ build for corpora larger than device HBM: train on a sample, then
    encode host slabs on device one at a time (parity: faiss's chunked
    train+add, `faiss_search/build.py:51-81`). Only the compressed codes
    (M [+ coarse_dim] [+ D for int8 refine] bytes/row) accumulate on device.

    refine='int8' stores int8 rerank rows (D B/vector, or refine_dim B/vector
    in the truncated-PCA space) for the exact re-rank stage — scale/projection
    come from the training sample, applied slab-by-slab. bf16/f32 refine is
    refused here: at host-slab scale it defeats the point.
    `keep_codes=False` (requires coarse_dim + refine) builds the serving
    codec: coarse scan -> direct refine, no PQ codes at all.
    """
    import numpy as np

    from vod_tpu.ops import pq as pq_ops

    if refine not in ("none", "int8"):
        raise ValueError(f"host-slab PQ build supports refine none|int8, got {refine!r}")
    if code_bits not in (8, 4):
        raise ValueError(f"code_bits must be 8 or 4, got {code_bits}")
    if code_bits == 4 and n_subquantizers % 2:
        raise ValueError("code_bits=4 requires an even n_subquantizers (nibble packing)")
    if not keep_codes and (coarse_dim is None or refine == "none"):
        raise ValueError("keep_codes=False requires coarse_dim and a refine store")
    n_codes = 1 << code_bits
    n_real, d = vectors_np.shape
    train = jnp.asarray(np.ascontiguousarray(vectors_np[:train_size]), dtype=jnp.float32)

    if keep_codes:
        rotation, codebooks, aniso_resolved = pq_ops.train_pq_codebooks(
            rng, train, n_subquantizers, n_codes=n_codes, kmeans_iters=kmeans_iters,
            use_opq=use_opq, opq_iters=4, aniso_eta=aniso_eta,
        )
    else:
        rotation, codebooks, aniso_resolved = None, jnp.zeros((1, 1, 1), jnp.float32), None
    train_rot = train if rotation is None else train @ rotation
    proj = coarse_scale = None
    if coarse_dim is not None:
        proj, _mean = pq_ops.train_projection(train_rot, coarse_dim)
        coarse_sample = train_rot @ proj
        coarse_absmax = jnp.max(jnp.abs(coarse_sample), axis=0, keepdims=True)
        coarse_scale = jnp.maximum(coarse_absmax, 1e-8) / 127.0
        del coarse_sample
    refine_scale = refine_proj = None
    if refine == "int8":
        ref_sample = train
        if refine_dim is not None and refine_dim < d:
            refine_proj, _m = pq_ops.train_projection(train, refine_dim)
            ref_sample = train @ refine_proj
        absmax = jnp.max(jnp.abs(ref_sample), axis=0, keepdims=True)
        refine_scale = jnp.maximum(absmax, 1e-8) / 127.0
        del ref_sample
    del train, train_rot

    # params ride as jit ARGUMENTS (a dict pytree): closed-over device arrays
    # are embedded as program literals, which the remote-compile relay ships
    # at ~100 s/MB per compile (rotation alone is d*d*4 B = 2.3 MB at d=768).
    enc_params = {
        "rotation": rotation, "codebooks": codebooks, "proj": proj,
        "coarse_scale": coarse_scale, "refine_proj": refine_proj,
        "refine_scale": refine_scale,
    }

    @jax.jit
    def encode_slab(x, p):
        xr = x @ p["rotation"] if rotation is not None else x
        codes = None
        if keep_codes:
            codes = pq_ops.encode_pq_auto(p["codebooks"], xr, eta=aniso_resolved)
            if code_bits == 4:
                codes = _pack_codes4(codes)
        coarse = None
        if proj is not None:
            coarse = jnp.clip(
                jnp.round((xr @ p["proj"]) / p["coarse_scale"]), -127, 127
            ).astype(jnp.int8)
        ref = None
        if refine_scale is not None:
            xr_ref = x @ p["refine_proj"] if refine_proj is not None else x
            ref = jnp.clip(jnp.round(xr_ref / p["refine_scale"]), -127, 127).astype(jnp.int8)
        return codes, coarse, ref

    pad_multiple = _auto_pad_multiple(n_real, None)
    n_pad = -(-n_real // pad_multiple) * pad_multiple
    code_cols = n_subquantizers // 2 if code_bits == 4 else n_subquantizers
    codes_np = np.zeros((n_pad, code_cols), np.uint8) if keep_codes else None
    coarse_np = np.zeros((n_pad, coarse_dim), np.int8) if coarse_dim is not None else None
    r_dim = d if refine_dim is None else min(refine_dim, d)
    refine_np = np.zeros((n_pad, r_dim), np.int8) if refine == "int8" else None
    for s0 in range(0, n_real, slab):
        x = jnp.asarray(np.ascontiguousarray(vectors_np[s0 : s0 + slab]), dtype=jnp.float32)
        c, cc, rr = encode_slab(x, enc_params)
        if codes_np is not None:
            codes_np[s0 : s0 + x.shape[0]] = np.asarray(c)
        if coarse_np is not None:
            coarse_np[s0 : s0 + x.shape[0]] = np.asarray(cc)
        if refine_np is not None:
            refine_np[s0 : s0 + x.shape[0]] = np.asarray(rr)
        del x

    if subset_ids is not None:
        subset_ids = _pad_rows(subset_ids.astype(jnp.int32)[:, None], pad_multiple)[:, 0]
    return PQIndex(
        codebooks=codebooks,
        codes=None if codes_np is None else jax.device_put(codes_np),
        coarse_codes=None if coarse_np is None else jax.device_put(coarse_np),
        coarse_scale=coarse_scale,
        proj=proj,
        rotation=rotation,
        subset_ids=subset_ids,
        refine_codes=None if refine_np is None else jax.device_put(refine_np),
        refine_scale=refine_scale,
        refine_proj=refine_proj,
        n_real=n_real,
        offset=offset,
        n_candidates=n_candidates,
        approx_recall=approx_recall,
        k_factor=k_factor,
        code_bits=code_bits,
        kernel=kernel,
        fused_bins=fused_bins,
        fused_tile=fused_tile,
    )
