"""Engine build orchestration from configs, with fingerprint-keyed caching.

Parity: reference `vod_search/factory.py` — `build_faiss_index:131` fingerprints
(vectors, config) and caches the index file at `cache_dir/indices/<fp>.faiss`;
`build_hybrid_search_engine:274` assembles sharded dense + sparse under one
hybrid master. Here the artifacts are orbax-saved index pytrees; expensive
builds (PQ/OPQ/IVF training) are reused across periods and restarts when the
fingerprint matches.
"""

from __future__ import annotations

import pathlib
import typing as typ

import jax
import jax.numpy as jnp
import numpy as np

from vod_tpu.configs.search import DenseFactoryConfig, HybridSearchFactoryConfig, SparseFactoryConfig
from .dense import DenseIndex, IVFIndex, PQIndex, build_dense_index, build_ivf_index, build_pq_index
from .hybrid import HybridEngines
from .ivfpq import IVFPQIndex, build_ivfpq_index
from .sharded import build_sharded_dense_index, shard_ivf_index, shard_ivfpq_index, shard_pq_index
from .sparse import SparseIndex, build_sparse_index

_INDEX_TYPES = {
    "DenseIndex": DenseIndex,
    "PQIndex": PQIndex,
    "IVFIndex": IVFIndex,
    "IVFPQIndex": IVFPQIndex,
    "SparseIndex": SparseIndex,
}


def _index_fingerprint(kind: str, cfg: typ.Any, data_fp: str) -> str:
    from vod_tpu.utils.fingerprint import fingerprint

    return fingerprint({"kind": kind, "cfg": cfg.model_dump(), "data": data_fp})


def _save_index(path: pathlib.Path, index: typ.Any) -> None:
    import json

    import orbax.checkpoint as ocp

    arrays, meta = {}, {}
    for name, value in index.__dict__.items():
        if value is None:
            meta[name] = None
        elif hasattr(value, "shape"):
            arrays[name] = value
        else:
            meta[name] = value
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path.absolute() / "arrays", arrays, force=True)
    (path / "meta.json").write_text(json.dumps({"type": type(index).__name__, "meta": meta}))


def _load_index(path: pathlib.Path) -> typ.Any:
    import json

    import orbax.checkpoint as ocp

    spec = json.loads((path / "meta.json").read_text())
    cls = _INDEX_TYPES[spec["type"]]
    with ocp.PyTreeCheckpointer() as ckptr:
        arrays = ckptr.restore(path.absolute() / "arrays")
    # meta holds every non-array field, including None-valued ones — any field
    # that was None in the live instance is Optional by construction, and some
    # (e.g. IVFPQIndex.codes with keep_codes=False) have no default to fall
    # back on, so None must be passed through rather than dropped.
    return cls(**arrays, **spec["meta"])


def build_dense_from_config(
    cfg: DenseFactoryConfig,
    vectors: jax.Array,
    *,
    rng: typ.Optional[jax.Array] = None,
    subset_ids: typ.Optional[jax.Array] = None,
    cache_dir: typ.Optional[str] = None,
    data_fingerprint: typ.Optional[str] = None,
    mesh: typ.Any = None,
) -> typ.Any:
    """Build (or load cached) a dense index per config.

    Every `DenseFactoryConfig` knob is honored here (parity: the faiss
    factory-string surface, reference `vod_configs/search.py:124`): codecs
    flat/int8/pq/ivf, `use_opq`, `approx_recall`, and — when `cfg.sharded` and
    a `mesh` is given — row-sharding over `cfg.shard_axis`.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    cache_path = None
    sharded_cheap = cfg.sharded and mesh is not None and cfg.codec in ("flat", "int8")
    if cache_dir is not None and data_fingerprint is not None and not sharded_cheap:
        # sharded flat/int8 skips the cache entirely: re-sharding rebuilds from
        # the raw vectors anyway, so restoring the full index is wasted IO
        fp = _index_fingerprint("dense", cfg, data_fingerprint)
        cache_path = pathlib.Path(cache_dir) / "indices" / fp
        if (cache_path / "meta.json").exists():
            index = _load_index(cache_path)
            if cfg.sharded and mesh is not None:
                return _shard_from_config(cfg, index, vectors, subset_ids, mesh)
            return index

    if sharded_cheap:
        # sharded flat/int8 builds directly into the mesh layout (no cache —
        # quantization + device_put is cheap relative to PQ/IVF training)
        return build_sharded_dense_index(
            vectors, mesh, axis=cfg.shard_axis,
            dtype="int8" if cfg.codec == "int8" else cfg.dtype,
            subset_ids=subset_ids, approx_recall=cfg.approx_recall, kernel=cfg.kernel,
        )

    if cfg.codec == "flat" or cfg.codec == "int8":
        dtype = "int8" if cfg.codec == "int8" else cfg.dtype
        # flat/int8 + refine='float32' keeps exact f32 rows for a k_factor*k
        # re-rank (faiss `Flat,RFlat` analogue): bf16/int8 scan recall is
        # rounding-capped (~0.989 at 1M x 768) without it
        flat_refine = "float32" if cfg.refine == "float32" else "none"
        index = build_dense_index(
            vectors, subset_ids=subset_ids, dtype=dtype, approx_recall=cfg.approx_recall,
            kernel=cfg.kernel, refine=flat_refine, k_factor=cfg.k_factor,
        )
    elif cfg.codec == "pq":
        index = build_pq_index(
            rng, vectors,
            n_subquantizers=cfg.n_subquantizers,
            code_bits=cfg.code_bits,
            coarse_dim=cfg.coarse_dim,
            n_candidates=cfg.n_candidates,
            train_size=cfg.train_size,
            kmeans_iters=cfg.kmeans_iters,
            use_opq=cfg.use_opq,
            opq_iters=cfg.opq_iters,
            refine=cfg.refine,
            refine_dim=cfg.refine_dim,
            k_factor=cfg.k_factor,
            subset_ids=subset_ids,
            approx_recall=cfg.approx_recall,
            aniso_eta=cfg.aniso_eta,
            keep_codes=cfg.keep_codes,
            kernel=cfg.kernel,
            fused_bins=cfg.fused_bins,
            fused_tile=cfg.fused_tile,
        )
    elif cfg.codec == "ivfpq":
        index = build_ivfpq_index(
            rng, vectors,
            n_clusters=cfg.n_clusters,
            nprobe=cfg.nprobe,
            window=cfg.ivf_window,
            max_windows=cfg.max_windows,
            n_subquantizers=cfg.n_subquantizers,
            code_bits=cfg.code_bits,
            train_size=cfg.train_size,
            kmeans_iters=cfg.kmeans_iters,
            use_opq=cfg.use_opq,
            opq_iters=cfg.opq_iters,
            refine=cfg.refine,
            refine_dim=cfg.refine_dim,
            rerank=cfg.rerank,
            rerank_dim=cfg.rerank_dim,
            k_factor=cfg.k_factor,
            keep_codes=cfg.keep_codes,
            subset_ids=subset_ids,
            approx_recall=cfg.approx_recall,
            mesh=mesh if cfg.sharded else None,
            mesh_axis=cfg.shard_axis,
            aniso_eta=cfg.aniso_eta,
            spill=cfg.spill,
            soar_lambda=cfg.soar_lambda,
        )
    elif cfg.codec == "ivf":
        index = build_ivf_index(
            rng, vectors,
            n_clusters=cfg.n_clusters,
            nprobe=cfg.nprobe,
            kmeans_iters=cfg.kmeans_iters,
            train_size=cfg.train_size,
            dtype=cfg.dtype,
            subset_ids=subset_ids,
        )
    else:
        raise ValueError(f"Unknown dense codec {cfg.codec!r}")

    if cache_path is not None:
        cache_path.mkdir(parents=True, exist_ok=True)
        _save_index(cache_path, index)
    if cfg.sharded and mesh is not None:
        return _shard_from_config(cfg, index, vectors, subset_ids, mesh)
    return index


def _shard_from_config(cfg: DenseFactoryConfig, index, vectors, subset_ids, mesh):
    if isinstance(index, IVFPQIndex):
        return shard_ivfpq_index(index, mesh, axis=cfg.shard_axis)
    if isinstance(index, PQIndex):
        return shard_pq_index(index, mesh, axis=cfg.shard_axis)
    if isinstance(index, IVFIndex):
        return shard_ivf_index(index, mesh, axis=cfg.shard_axis)
    if isinstance(index, DenseIndex):
        # loaded-from-cache flat index: re-shard the raw vectors
        return build_sharded_dense_index(
            vectors, mesh, axis=cfg.shard_axis,
            dtype="int8" if cfg.codec == "int8" else cfg.dtype,
            subset_ids=subset_ids, approx_recall=cfg.approx_recall, kernel=cfg.kernel,
        )
    raise ValueError(f"codec {cfg.codec!r} does not support sharding (flat/int8/pq/ivf do)")


def build_dense_from_host(
    cfg: DenseFactoryConfig,
    vectors_np: typ.Any,  # numpy [N, D] host RAM; may exceed HBM
    *,
    rng: typ.Optional[jax.Array] = None,
    subset_ids: typ.Optional[jax.Array] = None,
    mesh: typ.Any = None,
    slab: int = 1_000_000,
):
    """Config-driven index build from a HOST embedding matrix that may not fit
    in HBM (VERDICT r2 #2). Only the compressed representation lands on device:

      * pq  -> `build_pq_index_from_host` (train on a sample, encode host slabs
        on device one at a time; parity: faiss chunked train+add,
        `faiss_search/build.py:51-81`). int8 refine supported.
      * int8 -> slab-quantized int8 codes (scale from the first slab sample),
        D bytes/row on device.
      * flat -> refused above the bf16 budget (it cannot fit by definition);
        use the pq/int8 codecs at scale.

    `cfg.sharded` + mesh shards the built index as usual.
    """
    import numpy as np

    from .dense import build_pq_index_from_host
    from .sharded import shard_pq_index

    if rng is None:
        rng = jax.random.PRNGKey(0)
    n, d = vectors_np.shape

    if cfg.codec == "pq":
        refine = cfg.refine if cfg.refine in ("none", "int8") else "int8"
        if refine != cfg.refine:
            # a full-precision refine store (N x D x 2-4 B) cannot fit by this
            # path's premise (the corpus exceeds the HBM budget) — downgrade
            # LOUDLY so `RFlat`-style configs don't silently change semantics
            # when the periodic recipe crosses `embed_hbm_budget_bytes`.
            import warnings

            warnings.warn(
                f"build_dense_from_host: refine={cfg.refine!r} does not fit the "
                f"over-HBM build path; using int8 refine rows instead",
                stacklevel=2,
            )
        index = build_pq_index_from_host(
            rng, vectors_np,
            n_subquantizers=cfg.n_subquantizers,
            code_bits=cfg.code_bits,
            coarse_dim=cfg.coarse_dim,
            n_candidates=cfg.n_candidates,
            train_size=min(cfg.train_size or 500_000, n),
            kmeans_iters=cfg.kmeans_iters,
            use_opq=cfg.use_opq,
            refine=refine,
            refine_dim=cfg.refine_dim,
            k_factor=cfg.k_factor,
            slab=slab,
            subset_ids=subset_ids,
            approx_recall=cfg.approx_recall,
            aniso_eta=cfg.aniso_eta,
            keep_codes=cfg.keep_codes,
            kernel=cfg.kernel,
            fused_bins=cfg.fused_bins,
            fused_tile=cfg.fused_tile,
        )
        if cfg.sharded and mesh is not None:
            return shard_pq_index(index, mesh, axis=cfg.shard_axis)
        return index

    if cfg.codec == "int8":
        from vod_tpu.ops import pq as pq_ops
        from .dense import DenseIndex, _auto_pad_multiple

        sample = jnp.asarray(
            np.ascontiguousarray(vectors_np[: min(n, 500_000)]), dtype=jnp.float32
        )
        absmax = jnp.max(jnp.abs(sample), axis=0, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        del sample

        @jax.jit
        def enc(x):
            return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)

        sharded = cfg.sharded and mesh is not None
        tile = 1024 if cfg.kernel == "fused" else 128
        mult = (mesh.shape[cfg.shard_axis] * tile) if sharded else max(
            tile, _auto_pad_multiple(n, None)
        )
        n_pad = -(-n // mult) * mult
        codes_np = np.zeros((n_pad, d), np.int8)
        for s0 in range(0, n, slab):
            x = jnp.asarray(np.ascontiguousarray(vectors_np[s0 : s0 + slab]), dtype=jnp.float32)
            codes_np[s0 : s0 + x.shape[0]] = np.asarray(enc(x))
            del x
        if subset_ids is not None:
            sub_np = np.zeros((n_pad,), np.int32)
            sub_np[:n] = np.asarray(subset_ids).astype(np.int32)
        else:
            sub_np = None
        if sharded:
            # pre-quantized codes go straight into the mesh layout (re-running
            # build_sharded_dense_index would quantize the codes AGAIN and lose
            # the original scale)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .sharded import ShardedDenseIndex

            axis = cfg.shard_axis
            vec = jax.device_put(codes_np, NamedSharding(mesh, P(axis, None)))
            return ShardedDenseIndex(
                vectors=vec,
                scale=jax.device_put(scale, NamedSharding(mesh, P(None, None))),
                subset_ids=None if sub_np is None
                else jax.device_put(sub_np, NamedSharding(mesh, P(axis))),
                n_real=n,
                rows_per_shard=n_pad // mesh.shape[axis],
                axis=axis,
                mesh=mesh,
                approx_recall=cfg.approx_recall,
                kernel=cfg.kernel,
            )
        return DenseIndex(
            vectors=jax.device_put(codes_np), scale=scale,
            subset_ids=None if sub_np is None else jax.device_put(sub_np),
            n_real=n, approx_recall=cfg.approx_recall, kernel=cfg.kernel,
        )

    if cfg.codec == "ivfpq":
        from vod_tpu.ops import pq as pq_ops
        from vod_tpu.ops.kmeans import _assign_chunked
        from .dense import _pack_codes4
        from .ivfpq import (
            build_ivfpq_from_parts,
            train_ivfpq_stages,
            train_refine_int8_params,
        )
        from .sharded import shard_ivfpq_index

        refine = cfg.refine
        if refine in ("bfloat16", "float32"):
            import warnings

            warnings.warn(
                f"build_dense_from_host: refine={cfg.refine!r} does not fit the "
                f"over-HBM build path; using int8 refine rows instead",
                stacklevel=2,
            )
            refine = "int8"
        if not cfg.keep_codes and refine == "none":
            raise ValueError("ivfpq keep_codes=False requires a refine store")

        sample = jnp.asarray(
            np.ascontiguousarray(vectors_np[: min(n, cfg.train_size or 500_000)]),
            dtype=jnp.float32,
        )
        rotation, codebooks, centroids, aniso_resolved = train_ivfpq_stages(
            rng, sample,
            n_subquantizers=cfg.n_subquantizers, code_bits=cfg.code_bits,
            kmeans_iters=cfg.kmeans_iters, opq_iters=cfg.opq_iters,
            use_opq=cfg.use_opq, keep_codes=cfg.keep_codes,
            n_clusters=cfg.n_clusters, n_total=n, aniso_eta=cfg.aniso_eta,
        )
        refine_proj = refine_scale = None
        if refine == "int8":
            refine_proj, refine_scale = train_refine_int8_params(sample, cfg.refine_dim)
        rerank = cfg.rerank
        if rerank in ("bfloat16", "float32"):
            import warnings

            warnings.warn(
                f"build_dense_from_host: rerank={cfg.rerank!r} does not fit the "
                f"over-HBM build path; using int8 rerank rows instead",
                stacklevel=2,
            )
            rerank = "int8"
        rerank_proj = rerank_scale = None
        if rerank == "int8":
            rerank_proj, rerank_scale = train_refine_int8_params(sample, cfg.rerank_dim)
        del sample

        from .ivfpq import assign_soar

        # params ride as jit ARGUMENTS: closed-over device arrays embed as
        # program literals, which the remote-compile relay ships at ~100 s/MB
        # per compile (centroids alone is C*d*4 B = 12.6 MB at 4096 x 768).
        enc_params = {
            "rotation": rotation, "centroids": centroids, "codebooks": codebooks,
            "refine_proj": refine_proj, "refine_scale": refine_scale,
            "rerank_proj": rerank_proj, "rerank_scale": rerank_scale,
        }

        @jax.jit
        def enc_slab(x, p):
            x_rot = x if rotation is None else x @ p["rotation"]
            a = _assign_chunked(x_rot, p["centroids"])
            a2 = (
                assign_soar(x_rot, p["centroids"], a, soar_lambda=cfg.soar_lambda)
                if cfg.spill else a
            )
            codes = None
            if cfg.keep_codes:
                codes = pq_ops.encode_pq_auto(p["codebooks"], x_rot, eta=aniso_resolved)
                if cfg.code_bits == 4:
                    codes = _pack_codes4(codes)
            rows = None
            if refine == "int8":
                xr = x if refine_proj is None else x @ p["refine_proj"]
                rows = jnp.clip(jnp.round(xr / p["refine_scale"]), -127, 127).astype(jnp.int8)
            rr_rows = None
            if rerank == "int8":
                xr2 = x if rerank_proj is None else x @ p["rerank_proj"]
                rr_rows = jnp.clip(jnp.round(xr2 / p["rerank_scale"]), -127, 127).astype(jnp.int8)
            return a, a2, codes, rows, rr_rows

        assign_np = np.zeros((n,), np.int32)
        assign2_np = np.zeros((n,), np.int32) if cfg.spill else None
        m_bytes = cfg.n_subquantizers // (2 if cfg.code_bits == 4 else 1)
        codes_np = np.zeros((n, m_bytes), np.uint8) if cfg.keep_codes else None
        rdim = cfg.refine_dim if (refine == "int8" and cfg.refine_dim and cfg.refine_dim < d) else d
        refine_np = np.zeros((n, rdim), np.int8) if refine == "int8" else None
        rrdim = cfg.rerank_dim if (rerank == "int8" and cfg.rerank_dim and cfg.rerank_dim < d) else d
        rerank_np = np.zeros((n, rrdim), np.int8) if rerank == "int8" else None
        for s0 in range(0, n, slab):
            x = jnp.asarray(
                np.ascontiguousarray(vectors_np[s0 : s0 + slab]), dtype=jnp.float32
            )
            a, a2, codes, rows, rr_rows = enc_slab(x, enc_params)
            assign_np[s0 : s0 + x.shape[0]] = np.asarray(a)
            if assign2_np is not None:
                assign2_np[s0 : s0 + x.shape[0]] = np.asarray(a2)
            if codes is not None:
                codes_np[s0 : s0 + x.shape[0]] = np.asarray(codes)
            if rows is not None:
                refine_np[s0 : s0 + x.shape[0]] = np.asarray(rows)
            if rr_rows is not None:
                rerank_np[s0 : s0 + x.shape[0]] = np.asarray(rr_rows)
            del x, a, a2, codes, rows, rr_rows

        subset_ids_np = None if subset_ids is None else np.asarray(subset_ids).astype(np.int32)
        row_ids_np = None
        if cfg.spill:
            # SOAR duplication on the host (the codes/refine slabs double in
            # RAM, not HBM — the sorted layout lands on device once, below)
            assign_np = np.concatenate([assign_np, assign2_np])
            row_ids_np = np.tile(np.arange(n, dtype=np.int32), 2)
            if codes_np is not None:
                codes_np = np.concatenate([codes_np, codes_np])
            if refine_np is not None:
                refine_np = np.concatenate([refine_np, refine_np])
            if subset_ids_np is not None:
                subset_ids_np = np.tile(subset_ids_np, 2)

        index = build_ivfpq_from_parts(
            centroids, codebooks, assign_np, codes_np,
            rotation=rotation,
            refine_np=refine_np, refine_scale=refine_scale, refine_proj=refine_proj,
            rerank_np=rerank_np, rerank_scale=rerank_scale, rerank_proj=rerank_proj,
            k_factor=cfg.k_factor,
            subset_ids_np=subset_ids_np,
            window=cfg.ivf_window, nprobe=cfg.nprobe, max_windows=cfg.max_windows,
            code_bits=cfg.code_bits,
            approx_recall=cfg.approx_recall,
            row_ids_np=row_ids_np, n_real=n, spilled=cfg.spill,
        )
        if cfg.sharded and mesh is not None:
            return shard_ivfpq_index(index, mesh, axis=cfg.shard_axis)
        return index

    raise ValueError(
        f"host-slab build supports codecs pq|int8|ivfpq; {cfg.codec!r} requires the "
        "full matrix in HBM (use build_dense_from_config when it fits)"
    )


def build_sparse_from_config(
    cfg: SparseFactoryConfig,
    doc_terms: typ.Sequence[typ.Sequence[int]],
    *,
    n_terms: int = 1 << 18,
    subset_ids: typ.Optional[np.ndarray] = None,
    mesh: typ.Any = None,
    shard_axis: str = "shard",
) -> typ.Any:
    """Config-driven sparse build through the O(tokens) C++ postings builder
    (python fallback retained inside; VERDICT r2 #3). Pass `mesh` to shard the
    postings over a mesh axis (`ShardedSparseIndex`)."""
    from .sparse import build_sparse_index_native

    index = build_sparse_index_native(
        doc_terms,
        n_terms=n_terms,
        max_postings=cfg.max_postings,
        k1=cfg.k1,
        b=cfg.b,
        subset_ids=None if subset_ids is None else np.asarray(subset_ids),
    )
    if mesh is not None:
        from .sharded import shard_sparse_index

        return shard_sparse_index(index, mesh, axis=shard_axis)
    return index


def build_hybrid_engines(
    config: HybridSearchFactoryConfig,
    *,
    vectors: typ.Optional[jax.Array] = None,
    doc_terms: typ.Optional[typ.Sequence[typ.Sequence[int]]] = None,
    rng: typ.Optional[jax.Array] = None,
    subset_ids: typ.Optional[jax.Array] = None,
    cache_dir: typ.Optional[str] = None,
    data_fingerprint: typ.Optional[str] = None,
    mesh: typ.Any = None,
) -> HybridEngines:
    """Assemble the hybrid bundle (parity: `build_hybrid_search_engine:274`)."""
    dense = None
    if config.dense is not None and vectors is not None:
        dense = build_dense_from_config(
            config.dense, vectors, rng=rng, subset_ids=subset_ids,
            cache_dir=cache_dir, data_fingerprint=data_fingerprint, mesh=mesh,
        )
    sparse = None
    if config.sparse is not None and doc_terms is not None:
        # subset filtering must survive factory builds (the direct
        # `build_sparse_index` path always accepted it)
        sparse = build_sparse_from_config(
            config.sparse, doc_terms, subset_ids=subset_ids,
            mesh=mesh if config.sparse.sharded else None,
            shard_axis=config.sparse.shard_axis,
        )
    return HybridEngines(dense=dense, sparse=sparse)
