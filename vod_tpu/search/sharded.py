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


def build_sharded_dense_index(
    vectors: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "shard",
    dtype: str = "bfloat16",
    subset_ids: typ.Optional[jax.Array] = None,
    corpus_shard: typ.Optional[jax.Array] = None,
) -> ShardedDenseIndex:
    """Shard a corpus matrix row-wise across the mesh axis."""
    n_shards = mesh.shape[axis]
    n_real = int(vectors.shape[0])
    mult = n_shards * 128
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
    )


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
            q_eff = qv.astype(jnp.float32) * index.scale
        else:
            q_eff = qv.astype(vec.dtype)

        def score_chunk(start):
            v = jax.lax.dynamic_slice_in_dim(vec, start, chunk, axis=0)
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

        top_s, top_i = _scan_topk(score_chunk, rows, rows, b, top_k, chunk, approx_recall=0.95)
        top_i = jnp.where(top_i >= 0, top_i + g_offset, -1)
        # gather k results from every shard over ICI: [n_shards, B, k] on each device
        all_s = jax.lax.all_gather(top_s, axis)
        all_i = jax.lax.all_gather(top_i, axis)
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_shards * top_k)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_shards * top_k)
        out_s, pos = jax.lax.top_k(all_s, top_k)
        out_i = jnp.take_along_axis(all_i, pos, axis=-1)
        out_i = jnp.where(jnp.isfinite(out_s), out_i, -1)
        return out_s, jnp.where(jnp.isfinite(out_s), out_i, -1)

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
