"""Cross-device sharded dense search over a JAX mesh.

Parity: reference `src/vod_search/sharded_search.py` — scatter queries to shards,
search each, offset local indices into the global concatenated-corpus id space
(`sharded_search.py:103,155`), gather + pad back. Here the "shards" are devices:
the corpus matrix is row-sharded across a mesh axis in HBM; every device runs the
same SPMD program (local scan + top-k), local ids are offset by
`axis_index * rows_per_shard`, and one `all_gather` of k results per shard over
ICI feeds the global top-k — the cross-shard merge never moves score matrices.

Multi-corpus routing (the reference's per-query `shard` name, `TARGET_SHARD_KEY`)
is a per-query shard index: results from non-target shards are masked to -inf
before the gather.
"""

from __future__ import annotations

import functools
import typing as typ

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vod_tpu.types.retrieval import RetrievalBatch
from .base import SearchQueries
from .dense import DenseIndex, _pad_rows, _scan_topk
from vod_tpu.ops import pq as pq_ops


@struct.dataclass
class ShardedDenseIndex:
    vectors: jax.Array  # [N_pad, D] row-sharded over `axis`
    scale: typ.Optional[jax.Array] = None  # [1, D] replicated (int8 codec)
    subset_ids: typ.Optional[jax.Array] = None  # [N_pad] row-sharded
    corpus_shard: typ.Optional[jax.Array] = None  # [N_pad] corpus-id per row (routing)
    n_real: int = struct.field(pytree_node=False, default=0)
    rows_per_shard: int = struct.field(pytree_node=False, default=0)
    axis: str = struct.field(pytree_node=False, default="shard")
    mesh: typ.Any = struct.field(pytree_node=False, default=None)
    # approx_max_k recall target; None = exact per-shard selection.
    approx_recall: typ.Optional[float] = struct.field(pytree_node=False, default=0.95)
    # "scan" or "fused" (the Pallas binned kernel per shard; see dense.py).
    kernel: str = struct.field(pytree_node=False, default="scan")


def build_sharded_dense_index(
    vectors: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "shard",
    dtype: str = "bfloat16",
    subset_ids: typ.Optional[jax.Array] = None,
    corpus_shard: typ.Optional[jax.Array] = None,
    approx_recall: typ.Optional[float] = 0.95,
    kernel: str = "scan",
) -> ShardedDenseIndex:
    """Shard a corpus matrix row-wise across the mesh axis."""
    n_shards = mesh.shape[axis]
    n_real = int(vectors.shape[0])
    # fused kernel: every shard's row count must be a multiple of its tile
    mult = n_shards * (1024 if kernel == "fused" else 128)
    vectors = _pad_rows(vectors, mult)
    scale = None
    if dtype == "int8":
        codes, scale = pq_ops.quantize_int8(vectors.astype(jnp.float32), axis=0)
        vectors = codes
        scale = jax.device_put(scale, NamedSharding(mesh, P(None, None)))
    else:
        vectors = vectors.astype(jnp.dtype(dtype))
    vectors = jax.device_put(vectors, NamedSharding(mesh, P(axis, None)))

    def shard_1d(x: typ.Optional[jax.Array]) -> typ.Optional[jax.Array]:
        if x is None:
            return None
        x = _pad_rows(x.astype(jnp.int32)[:, None], mult)[:, 0]
        return jax.device_put(x, NamedSharding(mesh, P(axis)))

    return ShardedDenseIndex(
        vectors=vectors,
        scale=scale,
        subset_ids=shard_1d(subset_ids),
        corpus_shard=shard_1d(corpus_shard),
        n_real=n_real,
        rows_per_shard=vectors.shape[0] // n_shards,
        axis=axis,
        mesh=mesh,
        approx_recall=approx_recall,
        kernel=kernel,
    )


def _merge_across_shards(top_s, top_i, axis, n_shards, b, top_k, keep=None):
    """Gather k (score, global-id) pairs from every shard over ICI and take the
    global top-`keep` (default k) — the cross-shard merge never moves score
    matrices. `keep > top_k` leaves headroom for a post-merge dedup (SOAR)."""
    keep = top_k if keep is None else keep
    all_s = jax.lax.all_gather(top_s, axis)  # [n_shards, B, k] on each device
    all_i = jax.lax.all_gather(top_i, axis)
    all_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_shards * top_s.shape[-1])
    all_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_shards * top_i.shape[-1])
    out_s, pos = jax.lax.top_k(all_s, min(keep, all_s.shape[-1]))
    out_i = jnp.take_along_axis(all_i, pos, axis=-1)
    return out_s, jnp.where(jnp.isfinite(out_s), out_i, -1)


def sharded_dense_search(
    index: ShardedDenseIndex,
    queries: SearchQueries,
    top_k: int,
    *,
    chunk: int = 131072,
) -> RetrievalBatch:
    """SPMD search: local scan+top-k per shard, all_gather(k), global top-k."""
    mesh, axis = index.mesh, index.axis
    n_shards = mesh.shape[axis]
    rows = index.rows_per_shard
    chunk = min(chunk, rows)
    while rows % chunk != 0:
        chunk -= 128
    q = queries.vector
    b = q.shape[0]
    allowed = queries.subset_ids
    route = queries.shard

    def local_fn(vec, sub, cshard, qv, allow, rt):
        my = jax.lax.axis_index(axis)
        g_offset = my * rows
        if index.scale is not None:
            # int8 codec: same int8-MXU path as the single-device engine
            # (`dense.py` int8 branch) — fold the corpus scale into the query,
            # quantize per row, run the matmul in int8 with an int32 accumulator
            # (2x the bf16 MXU rate), factor the row scale back out.
            q_f = qv.astype(jnp.float32) * index.scale  # [B, D]
            q_absmax = jnp.max(jnp.abs(q_f), axis=-1, keepdims=True)
            q_row_scale = jnp.maximum(q_absmax, 1e-8) / 127.0
            q_i8 = jnp.clip(jnp.round(q_f / q_row_scale), -127, 127).astype(jnp.int8)
        else:
            q_eff = qv.astype(vec.dtype)

        if index.kernel == "fused" and allow is None and rt is None and index.approx_recall is not None:
            # per-shard fused Pallas kernel: the shard's row-validity bound is
            # TRACED (depends on axis_index) and rides into the kernel via
            # scalar prefetch; then the same all_gather(k) cross-shard merge.
            from vod_tpu.ops.mips_pallas import fused_mips_binned

            local_real = jnp.clip(index.n_real - g_offset, 0, rows)
            b_pad = (-b) % 16
            qk = q_i8 if index.scale is not None else q_eff
            if b_pad:
                qk = jnp.pad(qk, ((0, b_pad), (0, 0)))
            top_s, top_i = fused_mips_binned(
                vec, qk, k=top_k, n_real=local_real,
                interpret=jax.default_backend() == "cpu",
            )
            top_s, top_i = top_s[:b], top_i[:b]
            if index.scale is not None:
                valid = top_i >= 0
                top_s = jnp.where(valid, top_s.astype(jnp.float32) * q_row_scale, -jnp.inf)
            top_i = jnp.where(top_i >= 0, top_i + g_offset, -1)
            return _merge_across_shards(top_s, top_i, axis, n_shards, b, top_k)

        def score_chunk(start):
            v = jax.lax.dynamic_slice_in_dim(vec, start, chunk, axis=0)
            if index.scale is not None:
                acc = jax.lax.dot_general(
                    q_i8, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
                )
                s = acc.astype(jnp.float32) * q_row_scale
            else:
                s = jnp.dot(q_eff, v.T.astype(q_eff.dtype), preferred_element_type=jnp.float32)
            if allow is not None and sub is not None:
                sb = jax.lax.dynamic_slice_in_dim(sub, start, chunk, axis=0)
                ok = jnp.any(sb[None, None, :] == allow[:, :, None], axis=1)
                ok = ok | jnp.all(allow < 0, axis=-1, keepdims=True)
                s = jnp.where(ok, s, -jnp.inf)
            if rt is not None and cshard is not None:
                # multi-corpus routing: row visible only to queries targeting its corpus
                cs = jax.lax.dynamic_slice_in_dim(cshard, start, chunk, axis=0)
                s = jnp.where((rt[:, None] < 0) | (cs[None, :] == rt[:, None]), s, -jnp.inf)
            # global-row validity (corpus padding lives on the last shard)
            grow = g_offset + start + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            return jnp.where(grow < index.n_real, s, -jnp.inf)

        top_s, top_i = _scan_topk(
            score_chunk, rows, rows, b, top_k, chunk, approx_recall=index.approx_recall
        )
        top_i = jnp.where(top_i >= 0, top_i + g_offset, -1)
        return _merge_across_shards(top_s, top_i, axis, n_shards, b, top_k)

    in_specs = (
        P(axis, None),
        P(axis) if index.subset_ids is not None else None,
        P(axis) if index.corpus_shard is not None else None,
        P(),  # queries replicated
        P() if allowed is not None else None,
        P() if route is not None else None,
    )
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()), check_vma=False
    )
    out_s, out_i = fn(index.vectors, index.subset_ids, index.corpus_shard, q, allowed, route)
    return RetrievalBatch(scores=out_s, indices=out_i.astype(jnp.int32))


@struct.dataclass
class ShardedPQIndex:
    """PQ index row-sharded over a mesh axis: codes + coarse codes live in each
    device's HBM slice, codebooks/projection are replicated.

    Parity: `sharded_search.py:103` global-id-offset semantics at PQ scale —
    each shard runs the two-stage (coarse int8 scan -> ADC rescore) search on
    its rows, then one `all_gather` of k (score, global-id) pairs per shard
    feeds the global top-k over ICI. MSMARCO-scale multi-chip (BASELINE #3+#4):
    8.8M x (32+32) B ≈ 0.56 GB of codes split across the mesh.
    """

    codebooks: jax.Array  # [M, 256, dsub] replicated
    codes: jax.Array  # [N_pad, M] uint8, row-sharded
    coarse_codes: typ.Optional[jax.Array] = None  # [N_pad, dc] int8, row-sharded (None = exhaustive ADC)
    coarse_scale: typ.Optional[jax.Array] = None  # [1, dc] replicated
    proj: typ.Optional[jax.Array] = None  # [D, dc] replicated
    rotation: typ.Optional[jax.Array] = None  # [D, D] replicated (OPQ)
    subset_ids: typ.Optional[jax.Array] = None  # [N_pad] row-sharded
    corpus_shard: typ.Optional[jax.Array] = None  # [N_pad] row-sharded (routing)
    refine_codes: typ.Optional[jax.Array] = None  # [N_pad, D or R] row-sharded rerank rows
    refine_scale: typ.Optional[jax.Array] = None  # [1, R] replicated (int8 refine)
    refine_proj: typ.Optional[jax.Array] = None  # [D, R] replicated (truncated-PCA refine)
    n_real: int = struct.field(pytree_node=False, default=0)
    rows_per_shard: int = struct.field(pytree_node=False, default=0)
    axis: str = struct.field(pytree_node=False, default="shard")
    mesh: typ.Any = struct.field(pytree_node=False, default=None)
    n_candidates: int = struct.field(pytree_node=False, default=1024)
    approx_recall: typ.Optional[float] = struct.field(pytree_node=False, default=0.95)
    k_factor: int = struct.field(pytree_node=False, default=4)
    code_bits: int = struct.field(pytree_node=False, default=8)  # 4 = nibble-packed fast-scan


def shard_pq_index(
    index: "PQIndex",
    mesh: Mesh,
    *,
    axis: str = "shard",
    corpus_shard: typ.Optional[jax.Array] = None,
) -> ShardedPQIndex:
    """Shard an (already-built) PQIndex row-wise across the mesh axis."""
    from .dense import PQIndex  # local import to avoid cycle at module load

    n_shards = mesh.shape[axis]
    mult = n_shards * 128

    def repad2(x: jax.Array) -> jax.Array:
        # builder already padded to 128s; re-pad so rows divide the shard count
        return _pad_rows(x[: index.n_real] if x.shape[0] >= index.n_real else x, mult)

    row_sharded = NamedSharding(mesh, P(axis, None))
    codes = None if index.codes is None else jax.device_put(repad2(index.codes), row_sharded)
    coarse = None
    if index.coarse_codes is not None:
        coarse = jax.device_put(repad2(index.coarse_codes), row_sharded)
    refine = None
    if index.refine_codes is not None:
        refine = jax.device_put(repad2(index.refine_codes), row_sharded)
    rep = NamedSharding(mesh, P())

    def shard_1d(x: typ.Optional[jax.Array]) -> typ.Optional[jax.Array]:
        if x is None:
            return None
        x = _pad_rows(x[: index.n_real].astype(jnp.int32)[:, None], mult)[:, 0]
        return jax.device_put(x, NamedSharding(mesh, P(axis)))

    def rep_opt(x: typ.Optional[jax.Array]) -> typ.Optional[jax.Array]:
        return None if x is None else jax.device_put(x, rep)

    return ShardedPQIndex(
        codebooks=jax.device_put(index.codebooks, rep),
        codes=codes,
        coarse_codes=coarse,
        coarse_scale=rep_opt(index.coarse_scale),
        proj=rep_opt(index.proj),
        rotation=rep_opt(index.rotation),
        subset_ids=shard_1d(index.subset_ids),
        corpus_shard=shard_1d(corpus_shard),
        refine_codes=refine,
        refine_scale=rep_opt(index.refine_scale),
        refine_proj=rep_opt(index.refine_proj),
        n_real=index.n_real,
        rows_per_shard=(codes if codes is not None else coarse).shape[0] // n_shards,
        axis=axis,
        mesh=mesh,
        n_candidates=index.n_candidates,
        approx_recall=index.approx_recall,
        k_factor=index.k_factor,
        code_bits=index.code_bits,
    )


def sharded_pq_search(
    index: ShardedPQIndex,
    queries: SearchQueries,
    top_k: int,
    *,
    chunk: int = 131072,
) -> RetrievalBatch:
    """SPMD PQ search: per shard, coarse-scan + ADC-rescore (or exhaustive
    decode+matmul ADC) over its rows, optional exact re-rank against local raw
    rows, then all_gather(k) + global top-k (same merge shape as flat).

    With refine, each shard exactly rescores its ADC top (k_factor * k) and
    gathers k exact-scored pairs — equivalent to the unsharded refine (a global
    exact-top-k row is necessarily in its own shard's exact top-k) while the
    ICI traffic stays at k pairs/shard.
    """
    from .dense import _scan_collect_topk, _scan_topk, decode_rows

    mesh, axis = index.mesh, index.axis
    n_shards = mesh.shape[axis]
    rows = index.rows_per_shard
    exhaustive = index.coarse_codes is None
    direct = index.codes is None  # coarse→refine, no ADC (keep_codes=False)
    if direct and (exhaustive or index.refine_codes is None):
        raise ValueError("ShardedPQIndex with codes=None requires coarse + refine stores")
    if exhaustive:
        if index.refine_codes is not None and index.code_bits == 8:
            chunk = min(chunk, 32768)  # int8 one-hot decode: [chunk, M, 256] temp
        elif index.refine_codes is not None:
            chunk = min(chunk, 65536)  # 4-bit one-hot temp is 16x smaller
        else:
            chunk = min(chunk, 65536)  # bound the decoded [chunk, d] HBM temp
    chunk = min(chunk, rows)
    while rows % chunk != 0:
        chunk -= 128
    q = queries.vector
    b = q.shape[0]
    # proportional share of the candidate budget per shard (each global coarse
    # winner is almost surely in its shard's proportional top share)
    n_cand = min(rows, max(128, -(-index.n_candidates // n_shards)))
    k_local = min(top_k, n_cand if not exhaustive else rows)
    do_refine = index.refine_codes is not None
    n_pool = min(index.k_factor * top_k, rows) if do_refine else k_local
    allowed = queries.subset_ids
    route = queries.shard
    # subset/shard filtering concentrates finite scores (see dense._scan_collect_topk)
    filtered = (allowed is not None and index.subset_ids is not None) or route is not None

    def local_fn(codes, coarse, sub, cshard, refine, qv, allow, rt):
        my = jax.lax.axis_index(axis)
        g_offset = my * rows
        q_eff = qv.astype(jnp.float32)
        if index.rotation is not None:
            q_eff = q_eff @ index.rotation

        def _mask_chunk(s, start):
            if allow is not None and sub is not None:
                sb = jax.lax.dynamic_slice_in_dim(sub, start, chunk, axis=0)
                ok = jnp.any(sb[None, None, :] == allow[:, :, None], axis=1)
                ok = ok | jnp.all(allow < 0, axis=-1, keepdims=True)
                s = jnp.where(ok, s, -jnp.inf)
            if rt is not None and cshard is not None:
                cs = jax.lax.dynamic_slice_in_dim(cshard, start, chunk, axis=0)
                s = jnp.where((rt[:, None] < 0) | (cs[None, :] == rt[:, None]), s, -jnp.inf)
            grow = g_offset + start + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            return jnp.where(grow < index.n_real, s, -jnp.inf)

        from .dense import _unpack_codes4

        unpack = _unpack_codes4 if index.code_bits == 4 else (lambda c: c)
        if exhaustive:
            if do_refine:
                # int8 one-hot decode + int8 scan (4728 vs 1641 QPS at 8.8M,
                # identical recall — see dense._int8_adc_scan_inputs)
                from .dense import _int8_adc_scan_inputs, _int8_onehot_adc_chunk

                cb_i8, q_i8, q_row = _int8_adc_scan_inputs(index.codebooks, q_eff)

                def score_chunk(start):
                    c = unpack(jax.lax.dynamic_slice_in_dim(codes, start, chunk, axis=0))
                    return _mask_chunk(
                        _int8_onehot_adc_chunk(cb_i8, q_i8, q_row, c), start
                    )
            else:
                q_mm = q_eff.astype(jnp.float32)

                def score_chunk(start):
                    c = unpack(jax.lax.dynamic_slice_in_dim(codes, start, chunk, axis=0))
                    dec = decode_rows(index.codebooks, c, dtype=jnp.float32)
                    s = jnp.dot(q_mm, dec.T, preferred_element_type=jnp.float32)
                    return _mask_chunk(s, start)

            if index.approx_recall is not None and n_pool > 64:
                # wide refine pools: collect-then-one-top-k beats an n_pool-wide
                # running carry (see pq_search; measured 40x at pool 320)
                pool_s, pool_i = _scan_collect_topk(
                    score_chunk, rows, rows, b, n_pool, chunk,
                    approx_recall=index.approx_recall, concentrated=filtered,
                )
            else:
                pool_s, pool_i = _scan_topk(
                    score_chunk, rows, rows, b, n_pool, chunk,
                    approx_recall=index.approx_recall,
                )
        else:
            # int8 MXU coarse scan: per-row quantized query (identical math to
            # the unsharded pq_search so sharded == unsharded holds exactly)
            q_proj = (q_eff @ index.proj) * index.coarse_scale  # [B, dc]
            q_cr = jnp.maximum(jnp.max(jnp.abs(q_proj), axis=-1, keepdims=True), 1e-8) / 127.0
            q_ci8 = jnp.clip(jnp.round(q_proj / q_cr), -127, 127).astype(jnp.int8)

            def score_chunk(start):
                v = jax.lax.dynamic_slice_in_dim(coarse, start, chunk, axis=0)
                acc = jax.lax.dot_general(
                    q_ci8, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
                )
                return _mask_chunk(acc.astype(jnp.float32) * q_cr, start)

            n_stage1 = n_pool if direct else n_cand
            cand_s, cand_i = _scan_collect_topk(
                score_chunk, rows, rows, b, n_stage1, chunk,
                approx_recall=index.approx_recall, concentrated=filtered,
            )
            if direct:
                # coarse→refine direct (keep_codes=False): no ADC stage
                pool_s, pool_i = cand_s, cand_i
            else:
                # ADC rescore of the local candidates against the local codes
                safe_i = jnp.clip(cand_i, 0, rows - 1)
                cand_codes = unpack(codes[safe_i])  # [B, n_cand, M (unpacked)]
                lut = pq_ops.adc_lut(index.codebooks, q_eff)
                adc = pq_ops.adc_score_codes(lut, cand_codes)
                adc = jnp.where(jnp.isfinite(cand_s), adc, -jnp.inf)
                pool_s, pos = jax.lax.top_k(adc, min(n_pool, adc.shape[-1]))
                pool_i = jnp.take_along_axis(cand_i, pos, axis=-1)

        if do_refine:
            safe = jnp.clip(pool_i, 0, rows - 1)
            raw = refine[safe]  # [B, n_pool, R]
            qr = qv
            if index.refine_proj is not None:  # truncated-PCA refine space
                qr = qv.astype(jnp.float32) @ index.refine_proj
            if index.refine_scale is not None:
                q_r = qr.astype(jnp.float32) * index.refine_scale
                exact = jnp.einsum(
                    "bd,bkd->bk", q_r, raw.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
            else:
                exact = jnp.einsum(
                    "bd,bkd->bk", qr.astype(raw.dtype), raw,
                    preferred_element_type=jnp.float32,
                )
            exact = jnp.where(jnp.isfinite(pool_s), exact, -jnp.inf)
            loc_s, pos = jax.lax.top_k(exact, min(k_local, exact.shape[-1]))
            loc_i = jnp.take_along_axis(pool_i, pos, axis=-1)
        else:
            loc_s, loc_i = pool_s[:, :k_local], pool_i[:, :k_local]
        loc_i = jnp.where(jnp.isfinite(loc_s), loc_i + g_offset, -1)
        # cross-shard merge over ICI: k pairs per shard, never the score matrix
        all_s = jax.lax.all_gather(loc_s, axis)
        all_i = jax.lax.all_gather(loc_i, axis)
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_shards * k_local)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_shards * k_local)
        k_eff = min(top_k, all_s.shape[-1])
        out_s, pos = jax.lax.top_k(all_s, k_eff)
        out_i = jnp.take_along_axis(all_i, pos, axis=-1)
        if k_eff < top_k:
            pad = top_k - k_eff
            out_s = jnp.pad(out_s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            out_i = jnp.pad(out_i, ((0, 0), (0, pad)), constant_values=-1)
        out_i = jnp.where(jnp.isfinite(out_s), out_i, -1)
        return jnp.where(jnp.isfinite(out_s), out_s, -jnp.inf), out_i

    in_specs = (
        P(axis, None) if index.codes is not None else None,
        P(axis, None) if index.coarse_codes is not None else None,
        P(axis) if index.subset_ids is not None else None,
        P(axis) if index.corpus_shard is not None else None,
        P(axis, None) if index.refine_codes is not None else None,
        P(),
        P() if allowed is not None else None,
        P() if route is not None else None,
    )
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()), check_vma=False
    )
    out_s, out_i = fn(
        index.codes, index.coarse_codes, index.subset_ids, index.corpus_shard,
        index.refine_codes, q, allowed, route,
    )
    return RetrievalBatch(scores=out_s, indices=out_i.astype(jnp.int32))


@struct.dataclass
class ShardedIVFIndex:
    """IVF cells sharded over a mesh axis: centroids replicated, cluster slabs
    + row ids cell-sharded.

    Parity: `sharded_search.py:103` semantics for the IVF codec — every device
    computes the (replicated) centroid probe, but only scores the probed cells
    it OWNS; one `all_gather` of k (score, global-id) pairs per shard feeds the
    global top-k. Cell padding (to a multiple of the shard count) carries
    `row_ids = -1`, so padded cells score -inf and never surface.
    """

    centroids: jax.Array  # [C_pad, D] f32 replicated
    vectors: jax.Array  # [C_pad, S, D] cell-sharded
    row_ids: jax.Array  # [C_pad, S] cell-sharded (-1 = pad)
    subset_ids: typ.Optional[jax.Array] = None  # [C_pad, S] cell-sharded
    c_real: int = struct.field(pytree_node=False, default=0)
    cells_per_shard: int = struct.field(pytree_node=False, default=0)
    nprobe: int = struct.field(pytree_node=False, default=8)
    offset: int = struct.field(pytree_node=False, default=0)
    axis: str = struct.field(pytree_node=False, default="shard")
    mesh: typ.Any = struct.field(pytree_node=False, default=None)


def shard_ivf_index(index, mesh: Mesh, *, axis: str = "shard") -> "ShardedIVFIndex":
    """Shard an `IVFIndex`'s cells across the mesh axis."""
    n_shards = mesh.shape[axis]
    c, s, d = index.vectors.shape
    pad = (-c) % n_shards

    def pad_cells(x, fill):
        if pad == 0:
            return x
        widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    vectors = jax.device_put(
        pad_cells(index.vectors, 0), NamedSharding(mesh, P(axis, None, None))
    )
    row_ids = jax.device_put(pad_cells(index.row_ids, -1), NamedSharding(mesh, P(axis, None)))
    subset_ids = None
    if index.subset_ids is not None:
        subset_ids = jax.device_put(
            pad_cells(index.subset_ids, -1), NamedSharding(mesh, P(axis, None))
        )
    centroids = jax.device_put(
        pad_cells(index.centroids, 0), NamedSharding(mesh, P(None, None))
    )
    return ShardedIVFIndex(
        centroids=centroids,
        vectors=vectors,
        row_ids=row_ids,
        subset_ids=subset_ids,
        c_real=c,
        cells_per_shard=(c + pad) // n_shards,
        nprobe=index.nprobe,
        offset=index.offset,
        axis=axis,
        mesh=mesh,
    )


def sharded_ivf_search(
    index: ShardedIVFIndex,
    queries: SearchQueries,
    top_k: int,
) -> RetrievalBatch:
    """SPMD IVF: replicated probe, owner-only cell scoring, all_gather(k) merge."""
    mesh, axis = index.mesh, index.axis
    n_shards = mesh.shape[axis]
    cpd = index.cells_per_shard
    q = queries.vector
    if q is None:
        raise ValueError("sharded_ivf_search requires queries.vector")
    b = q.shape[0]
    nprobe = min(index.nprobe, index.c_real)
    allowed = queries.subset_ids

    def local_fn(cent, vec, ids, sub, qv, allow):
        my = jax.lax.axis_index(axis)
        cscores = jnp.dot(qv.astype(jnp.float32), cent.T, preferred_element_type=jnp.float32)
        cell_idx = jax.lax.broadcasted_iota(jnp.int32, cscores.shape, 1)
        cscores = jnp.where(cell_idx < index.c_real, cscores, -jnp.inf)
        _, probe = jax.lax.top_k(cscores, nprobe)  # [B, P] — identical on every shard

        def one_probe(p):
            cell = probe[:, p]  # [B] global cell id
            owned = (cell // cpd) == my
            local = jnp.clip(cell - my * cpd, 0, cpd - 1)
            slab = vec[local]  # [B, S, D] gather from the LOCAL slab block
            rid = ids[local]  # [B, S]
            sc = jnp.einsum(
                "bd,bsd->bs", qv.astype(slab.dtype), slab, preferred_element_type=jnp.float32
            )
            sc = jnp.where(owned[:, None] & (rid >= 0), sc, -jnp.inf)
            if allow is not None and sub is not None:
                ss = sub[local]
                ok = jnp.any(ss[:, :, None] == allow[:, None, :], axis=-1)
                ok = ok | jnp.all(allow < 0, axis=-1, keepdims=True)
                sc = jnp.where(ok, sc, -jnp.inf)
            k_c = min(top_k, sc.shape[-1])
            ts, tp = jax.lax.top_k(sc, k_c)
            return ts, jnp.take_along_axis(rid, tp, axis=-1)

        ps, pi = jax.lax.map(one_probe, jnp.arange(nprobe))  # [P, B, k']
        all_s = jnp.moveaxis(ps, 0, 1).reshape(b, -1)
        all_i = jnp.moveaxis(pi, 0, 1).reshape(b, -1)
        top_s, pos = jax.lax.top_k(all_s, top_k)
        top_i = jnp.take_along_axis(all_i, pos, axis=-1)
        top_i = jnp.where(jnp.isfinite(top_s), top_i, -1)
        return _merge_across_shards(top_s, top_i, axis, n_shards, b, top_k)

    in_specs = (
        P(None, None),
        P(axis, None, None),
        P(axis, None),
        P(axis, None) if index.subset_ids is not None else None,
        P(),
        P() if allowed is not None else None,
    )
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()), check_vma=False
    )
    out_s, out_i = fn(index.centroids, index.vectors, index.row_ids, index.subset_ids, q, allowed)
    out_i = jnp.where(out_i >= 0, out_i + index.offset, -1)
    return RetrievalBatch(scores=out_s, indices=out_i.astype(jnp.int32))


@struct.dataclass
class ShardedSparseIndex:
    """BM25 impact postings doc-sharded over a mesh axis (VERDICT r2 #3).

    Parity: the reference wraps ES under `ShardedSearchClient`
    (`sharded_search.py:28`) so postings scale across nodes; here each device
    owns the postings of a contiguous doc range (split from ONE globally-built
    impact table, so idf/avgdl/truncation stats stay global and sharded ==
    unsharded results exactly). Doc ids inside the tables stay GLOBAL, so the
    merge is just all_gather(k) + top-k — no offset bookkeeping.

    At MSMARCO scale (`max_postings=4096` x 2^18 terms x 8 B) a replicated
    table is multi-GB per device; doc-sharding divides it by the mesh axis.
    """

    postings_docs: jax.Array  # [S, T, P_s] int32 global doc ids, sharded on axis 0
    postings_impacts: jax.Array  # [S, T, P_s] f32
    subset_ids: typ.Optional[jax.Array] = None  # [N] int32 REPLICATED (gathered by global doc id)
    n_docs: int = struct.field(pytree_node=False, default=0)
    offset: int = struct.field(pytree_node=False, default=0)
    axis: str = struct.field(pytree_node=False, default="shard")
    mesh: typ.Any = struct.field(pytree_node=False, default=None)


def shard_sparse_index(
    index: "SparseIndex",
    mesh: Mesh,
    *,
    axis: str = "shard",
) -> ShardedSparseIndex:
    """Split a globally-built SparseIndex's postings by contiguous doc range.

    Vectorized host split: per shard, stable-sort each term's postings by
    "outside my doc range" so in-range entries compact to the front, then trim
    to the widest in-range run. Impacts/idf are untouched (global stats), so
    the union of shard tables == the original table.
    """
    import numpy as np

    from .sparse import SparseIndex  # noqa: F401  (type reference)

    n_shards = mesh.shape[axis]
    docs = np.asarray(index.postings_docs)  # [T, P]
    imps = np.asarray(index.postings_impacts)
    n_docs = index.n_docs
    per = -(-n_docs // n_shards)

    shard_docs, shard_imps, widths = [], [], []
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, n_docs)
        mask = (docs >= lo) & (docs < hi)
        order = np.argsort(~mask, axis=1, kind="stable")  # in-range first
        d = np.take_along_axis(docs, order, axis=1)
        m = np.take_along_axis(mask, order, axis=1)
        i = np.take_along_axis(imps, order, axis=1)
        d = np.where(m, d, -1)
        i = np.where(m, i, 0.0)
        widths.append(max(1, int(m.sum(axis=1).max()) if m.any() else 1))
        shard_docs.append(d)
        shard_imps.append(i)
    width = max(widths)
    stacked_d = np.stack([d[:, :width] for d in shard_docs])  # [S, T, width]
    stacked_i = np.stack([i[:, :width] for i in shard_imps])

    return ShardedSparseIndex(
        postings_docs=jax.device_put(stacked_d, NamedSharding(mesh, P(axis, None, None))),
        postings_impacts=jax.device_put(stacked_i, NamedSharding(mesh, P(axis, None, None))),
        subset_ids=None if index.subset_ids is None
        else jax.device_put(index.subset_ids, NamedSharding(mesh, P())),
        n_docs=n_docs,
        offset=index.offset,
        axis=axis,
        mesh=mesh,
    )


def sharded_sparse_search(
    index: ShardedSparseIndex,
    queries: SearchQueries,
    top_k: int,
) -> RetrievalBatch:
    """SPMD BM25: each shard scores its doc range's postings (global doc ids),
    all_gather(k) pairs per shard, global top-k — the same merge shape as the
    dense engines (ICI traffic = k pairs/shard, never the postings)."""
    from .sparse import bm25_topk

    terms = queries.terms
    if terms is None:
        raise ValueError("sparse_search requires queries.terms")
    mesh, axis = index.mesh, index.axis
    n_shards = mesh.shape[axis]
    b = terms.shape[0]
    weights = queries.term_weights
    allowed = queries.subset_ids

    def local_fn(docs3, imps3, sub, t, w, allow):
        loc_s, loc_d = bm25_topk(
            docs3[0], imps3[0], t, w, top_k,
            doc_subset_ids=sub, query_subset_ids=allow,
        )
        loc_d = jnp.where(jnp.isfinite(loc_s), loc_d, -1)
        all_s = jax.lax.all_gather(loc_s, axis)  # [S, B, k]
        all_d = jax.lax.all_gather(loc_d, axis)
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_shards * top_k)
        all_d = jnp.moveaxis(all_d, 0, 1).reshape(b, n_shards * top_k)
        out_s, pos = jax.lax.top_k(all_s, top_k)
        out_d = jnp.take_along_axis(all_d, pos, axis=-1)
        out_d = jnp.where(jnp.isfinite(out_s), out_d, -1)
        return jnp.where(jnp.isfinite(out_s), out_s, -jnp.inf), out_d

    in_specs = (
        P(axis, None, None),
        P(axis, None, None),
        P() if index.subset_ids is not None else None,
        P(),
        P() if weights is not None else None,
        P() if allowed is not None else None,
    )
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()), check_vma=False
    )
    out_s, out_d = fn(
        index.postings_docs, index.postings_impacts, index.subset_ids,
        terms, weights, allowed,
    )
    ok = jnp.isfinite(out_s)
    out_d = jnp.where(ok, out_d + index.offset, -1)
    return RetrievalBatch(scores=out_s, indices=out_d.astype(jnp.int32))


@struct.dataclass
class ShardedIVFPQIndex:
    """IVF-PQ cell-sharded over a mesh axis (parity: `sharded_search.py:28`
    wrapping faiss IVF indexes).

    Cells are assigned round-robin to shards and each shard holds its OWN
    cluster-sorted window layout over its cells; `win_start`/`win_count` are
    per-shard [C] tables with zero counts for non-local cells, so the probe
    stage (replicated centroids, identical top-nprobe cells on every device)
    naturally emits only local windows on each shard. Unlike row-striping the
    flat layout, this divides the probed-window scan itself ~n_shards ways.
    Row ids in the local layouts are ORIGINAL global ids — the all_gather(k)
    merge needs no offset arithmetic.
    """

    centroids: jax.Array  # [C, D] replicated
    codebooks: jax.Array  # [M, n_codes, dsub] replicated
    codes: typ.Optional[jax.Array]  # [S*slots, Mc] row-sharded (None = refine-only)
    row_ids: jax.Array  # [S*slots] row-sharded, ORIGINAL ids, -1 padding
    win_start: jax.Array  # [S*C] sharded: per-shard local window starts
    win_count: jax.Array  # [S*C] sharded: zero for non-local cells
    rotation: typ.Optional[jax.Array] = None  # replicated
    subset_ids: typ.Optional[jax.Array] = None  # [S*slots] row-sharded
    refine_codes: typ.Optional[jax.Array] = None  # [S*slots, R] row-sharded
    refine_scale: typ.Optional[jax.Array] = None  # replicated
    refine_proj: typ.Optional[jax.Array] = None  # replicated
    # faiss-IndexRefine rerank store, REPLICATED (gathered by arbitrary global
    # row id post-merge — replication trades HBM for avoiding a cross-shard
    # gather; keep rerank_dim small or rely on the row-sharded refine store
    # when per-device memory is the constraint)
    rerank_codes: typ.Optional[jax.Array] = None  # [n_real, R2] replicated
    rerank_scale: typ.Optional[jax.Array] = None  # replicated
    rerank_proj: typ.Optional[jax.Array] = None  # replicated
    k_factor: int = struct.field(pytree_node=False, default=16)
    n_real: int = struct.field(pytree_node=False, default=0)
    offset: int = struct.field(pytree_node=False, default=0)
    slots_per_shard: int = struct.field(pytree_node=False, default=0)
    axis: str = struct.field(pytree_node=False, default="shard")
    mesh: typ.Any = struct.field(pytree_node=False, default=None)
    window: int = struct.field(pytree_node=False, default=512)
    nprobe: int = struct.field(pytree_node=False, default=32)
    max_windows: int = struct.field(pytree_node=False, default=0)  # per-shard budget
    code_bits: int = struct.field(pytree_node=False, default=8)
    approx_recall: typ.Optional[float] = struct.field(pytree_node=False, default=0.95)
    # SOAR-spilled rows: a row's two copies may land on DIFFERENT shards, so
    # the cross-shard merge gathers 2k per shard and dedups globally
    spilled: bool = struct.field(pytree_node=False, default=False)


def shard_ivfpq_index(
    index,  # IVFPQIndex
    mesh: Mesh,
    *,
    axis: str = "shard",
    max_windows_local: typ.Optional[int] = None,
) -> ShardedIVFPQIndex:
    """Re-layout an (already-built) IVFPQIndex as per-shard window layouts.

    Host-side assembly: pulls the sorted arrays once, permutes each shard's
    cells' windows into a contiguous local layout, pads every shard to the
    largest local slot count (SPMD equal shapes).
    """
    import numpy as np

    n_shards = mesh.shape[axis]
    window = index.window
    c = int(index.centroids.shape[0])
    wc = np.asarray(index.win_count).astype(np.int64)  # [C]
    ws = np.asarray(index.win_start).astype(np.int64)
    shard_of = np.arange(c) % n_shards

    # per-shard window tables: local starts via cumsum over local counts
    wc_l = np.zeros((n_shards, c), np.int32)
    ws_l = np.zeros((n_shards, c), np.int32)
    n_w_local = np.zeros((n_shards,), np.int64)
    for s in range(n_shards):
        cells = np.where(shard_of == s)[0]
        cum = np.concatenate([[0], np.cumsum(wc[cells])])
        wc_l[s, cells] = wc[cells]
        ws_l[s, cells] = cum[:-1]
        n_w_local[s] = cum[-1]
    n_w_max = int(n_w_local.max())
    slots = n_w_max * window

    # per-shard global slot ids (into the unsharded sorted layout)
    def shard_slots(s: int) -> np.ndarray:
        cells = np.where((shard_of == s) & (wc > 0))[0]
        return np.concatenate(
            [np.arange(ws[ci] * window, (ws[ci] + wc[ci]) * window) for ci in cells]
        ) if cells.size else np.zeros((0,), np.int64)

    sel = [shard_slots(s) for s in range(n_shards)]

    def gather(x: typ.Optional[jax.Array], fill) -> typ.Optional[jax.Array]:
        if x is None:
            return None
        xn = np.asarray(x)
        out = np.full((n_shards, slots) + xn.shape[1:], fill, xn.dtype)
        for s in range(n_shards):
            out[s, : sel[s].size] = xn[sel[s]]
        flat = out.reshape((n_shards * slots,) + xn.shape[1:])
        spec = P(axis, None) if xn.ndim > 1 else P(axis)
        # device_put straight from the host array: each device receives only its
        # shard — staging the full array on one device first would double peak
        # HBM right when the index only fits split across devices.
        return jax.device_put(flat, NamedSharding(mesh, spec))

    rep = NamedSharding(mesh, P())

    def rep_opt(x):
        return None if x is None else jax.device_put(x, rep)

    n_total_w = int(wc.sum())
    if max_windows_local is None:
        if index.max_windows <= 0 or index.max_windows >= n_total_w:
            max_windows_local = n_w_max  # untruncated stays untruncated
        else:
            # probe budget divides ~evenly across shards; 1.5x slack for skew
            max_windows_local = min(
                n_w_max, max(1, -(-3 * index.max_windows // (2 * n_shards)))
            )

    return ShardedIVFPQIndex(
        centroids=jax.device_put(index.centroids, rep),
        codebooks=jax.device_put(index.codebooks, rep),
        codes=gather(index.codes, 0),
        row_ids=gather(index.row_ids, -1),
        win_start=jax.device_put(
            jnp.asarray(ws_l.reshape(-1)), NamedSharding(mesh, P(axis))
        ),
        win_count=jax.device_put(
            jnp.asarray(wc_l.reshape(-1)), NamedSharding(mesh, P(axis))
        ),
        rotation=rep_opt(index.rotation),
        subset_ids=gather(index.subset_ids, -1),
        refine_codes=gather(index.refine_codes, 0),
        refine_scale=rep_opt(index.refine_scale),
        refine_proj=rep_opt(index.refine_proj),
        rerank_codes=rep_opt(index.rerank_codes),
        rerank_scale=rep_opt(index.rerank_scale),
        rerank_proj=rep_opt(index.rerank_proj),
        k_factor=index.k_factor,
        n_real=index.n_real,
        offset=index.offset,
        slots_per_shard=slots,
        axis=axis,
        mesh=mesh,
        window=window,
        nprobe=index.nprobe,
        max_windows=int(max_windows_local),
        code_bits=index.code_bits,
        approx_recall=index.approx_recall,
        spilled=index.spilled,
    )


def sharded_ivfpq_search(
    index: ShardedIVFPQIndex,
    queries: SearchQueries,
    top_k: int,
) -> RetrievalBatch:
    """SPMD IVF-PQ: every shard probes the SAME top-nprobe cells (replicated
    centroids) but its window table only yields local windows; each runs the
    single-device `ivfpq_search` on its local layout, then the all_gather(k)
    merge. Local row ids are already global, so no offset pass is needed."""
    from .ivfpq import IVFPQIndex, ivfpq_search

    mesh, axis = index.mesh, index.axis
    n_shards = mesh.shape[axis]
    q = queries.vector
    b = q.shape[0]
    allowed = queries.subset_ids
    # rerank runs ONCE, post-merge, on the globally pooled candidates — the
    # shards pool `k_factor*k` window-scored candidates each so the merged
    # pool matches the unsharded IndexRefine pool exactly
    do_rerank = index.rerank_codes is not None
    pool = max(1, index.k_factor) * top_k if do_rerank else top_k

    def local_fn(cent, cb, codes, rid, ws, wcnt, rot, sub, ref, rsc, rpj, qv, allow):
        local = IVFPQIndex(
            centroids=cent, codebooks=cb, codes=codes, row_ids=rid,
            win_start=ws, win_count=wcnt, rotation=rot, subset_ids=sub,
            refine_codes=ref, refine_scale=rsc, refine_proj=rpj,
            n_real=index.n_real, offset=index.offset, window=index.window,
            nprobe=index.nprobe, max_windows=index.max_windows,
            code_bits=index.code_bits,
            approx_recall=index.approx_recall,
            spilled=index.spilled,
        )
        out = ivfpq_search(local, SearchQueries(vector=qv, subset_ids=allow), pool)
        # spilled: a row's copies can live on two shards (each local result is
        # already deduped) — gather 2*pool and dedup after the merge
        keep = 2 * pool if index.spilled else pool
        return _merge_across_shards(out.scores, out.indices, axis, n_shards, b, pool, keep=keep)

    def spec2(x):
        return P(axis, None) if x is not None else None

    def spec1(x):
        return P(axis) if x is not None else None

    in_specs = (
        P(), P(), spec2(index.codes), P(axis), P(axis), P(axis),
        P() if index.rotation is not None else None,
        spec1(index.subset_ids), spec2(index.refine_codes),
        P() if index.refine_scale is not None else None,
        P() if index.refine_proj is not None else None,
        P(), P() if allowed is not None else None,
    )
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()), check_vma=False
    )
    out_s, out_i = fn(
        index.centroids, index.codebooks, index.codes, index.row_ids,
        index.win_start, index.win_count, index.rotation, index.subset_ids,
        index.refine_codes, index.refine_scale, index.refine_proj, q, allowed,
    )
    if index.spilled:
        from .ivfpq import _dedup_equal_rows

        out_s, out_i = _dedup_equal_rows(out_s, out_i.astype(jnp.int32), pool)
    if do_rerank:
        from .ivfpq import rerank_candidates

        out_s, out_i = rerank_candidates(
            q, out_s, out_i.astype(jnp.int32), top_k,
            rerank_codes=index.rerank_codes,
            rerank_scale=index.rerank_scale,
            rerank_proj=index.rerank_proj,
            offset=index.offset,
        )
    else:
        out_s = out_s[:, :top_k]
        out_i = out_i[:, :top_k]
    return RetrievalBatch(scores=out_s, indices=out_i.astype(jnp.int32))


# --------------------------------------------------------------------------- #
# sharded MaxSim (late-interaction) rerank
# --------------------------------------------------------------------------- #


@struct.dataclass
class ShardedMaxSimIndex:
    """Row-sharded token-level store: at MSMARCO scale a [8.8M, 32, 128] int8
    token matrix is ~36 GB — it only exists split across devices. Each shard
    reranks the candidates whose rows it owns; a `pmax` merges (every global id
    has exactly ONE owner, all others emit -inf)."""

    token_codes: jax.Array  # [N_pad, Lt, R] sharded P(axis, None, None)
    token_mask: jax.Array  # [N_pad, Lt] sharded P(axis, None)
    scale: typ.Optional[jax.Array]  # replicated
    proj: typ.Optional[jax.Array]  # replicated
    n_real: int = struct.field(pytree_node=False, default=0)
    rows_per_shard: int = struct.field(pytree_node=False, default=0)
    offset: int = struct.field(pytree_node=False, default=0)
    axis: str = struct.field(pytree_node=False, default="shard")
    mesh: typ.Any = struct.field(pytree_node=False, default=None)


def shard_maxsim_index(index, mesh: Mesh, *, axis: str = "shard") -> ShardedMaxSimIndex:
    """Re-layout a (host- or device-built) MaxSimIndex row-sharded over `axis`.

    Arrays go host -> per-device shards directly (`device_put` with the target
    sharding; never staged whole on one device)."""
    import numpy as np

    n_shards = mesh.shape[axis]
    n = index.n_real
    n_pad = -(-n // n_shards) * n_shards
    codes = np.zeros((n_pad,) + tuple(index.token_codes.shape[1:]), np.asarray(index.token_codes[:1]).dtype)
    codes[:n] = np.asarray(index.token_codes[:n])
    mask = np.zeros((n_pad, index.token_mask.shape[1]), bool)
    mask[:n] = np.asarray(index.token_mask[:n])
    rep = NamedSharding(mesh, P())
    return ShardedMaxSimIndex(
        token_codes=jax.device_put(codes, NamedSharding(mesh, P(axis, None, None))),
        token_mask=jax.device_put(mask, NamedSharding(mesh, P(axis, None))),
        scale=None if index.scale is None else jax.device_put(index.scale, rep),
        proj=None if index.proj is None else jax.device_put(index.proj, rep),
        n_real=n,
        rows_per_shard=n_pad // n_shards,
        offset=index.offset,
        axis=axis,
        mesh=mesh,
    )


def sharded_maxsim_rerank(
    index: ShardedMaxSimIndex,
    query_tokens: jax.Array,  # [B, Lq, D] f32
    query_mask: jax.Array,  # [B, Lq]
    candidate_ids: jax.Array,  # [B, C] global ids, -1 padding
) -> jax.Array:
    """MaxSim scores [B, C]; exactly equal to the unsharded `maxsim_rerank`."""
    from .maxsim import _score_gathered

    mesh, axis = index.mesh, index.axis
    rps = index.rows_per_shard
    q = query_tokens.astype(jnp.float32)
    if index.proj is not None:
        q = q @ index.proj
    qm = query_mask.astype(bool)

    def local_fn(codes, mask, cand, qq, qmm):
        shard = jax.lax.axis_index(axis)
        local = cand - index.offset - shard * rps
        own = (local >= 0) & (local < rps) & (cand >= 0)
        safe = jnp.clip(local, 0, rps - 1)
        scores = _score_gathered(codes[safe], mask[safe], qq, qmm, index.scale)
        scores = jnp.where(own, scores, -jnp.inf)
        return jax.lax.pmax(scores, axis)

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(index.token_codes, index.token_mask, candidate_ids, q, qm)
