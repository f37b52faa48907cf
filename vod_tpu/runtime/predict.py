"""Embedding computation: re-embed a tokenized corpus with the current encoder.

Parity: reference `vod_ops/workflows/predict/` (`Predict:27`,
`compute_and_store_predictions:51`) — the reference runs a Lightning predict loop
writing float32 vectors to a tensorstore file per batch (device->host copy every
step, `compute.py:119`). Here the forward is a jitted chunked scan whose output
STAYS on device, feeding index construction directly (SURVEY §7 step 4: "no host
round-trip"). Fingerprint-keyed host caching lives in vod_tpu/utils/cache.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp

from .collate import DeviceCorpus


def compute_embeddings(
    apply_fn: typ.Callable[[typ.Any, jax.Array, jax.Array], jax.Array],
    params: typ.Any,
    corpus: DeviceCorpus,
    *,
    chunk: int = 512,
    dtype: typ.Any = jnp.float32,
    mesh: typ.Any = None,
    dp_axis: str = "dp",
) -> jax.Array:
    """Embed every corpus row. Returns [N, H] on device.

    `apply_fn(params, input_ids, attention_mask) -> [b, H]` — typically
    `lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field)`.
    """
    n = corpus.size
    n_chunks = (n + chunk - 1) // chunk
    if mesh is not None and dp_axis in mesh.shape:
        # data-parallel striding (parity: DDP ranks striding the predict
        # dataset, `predict/compute.py:91-115`): chunks shard over dp.
        dp = mesh.shape[dp_axis]
        n_chunks = -(-n_chunks // dp) * dp
    pad = n_chunks * chunk - n
    ids = jnp.pad(corpus.input_ids, ((0, pad), (0, 0)))
    mask = jnp.pad(corpus.attention_mask, ((0, pad), (0, 0)))
    ids = ids.reshape(n_chunks, chunk, -1)
    mask = mask.reshape(n_chunks, chunk, -1)
    if mesh is not None and dp_axis in mesh.shape:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ids = jax.device_put(ids, NamedSharding(mesh, P(dp_axis)))
        mask = jax.device_put(mask, NamedSharding(mesh, P(dp_axis)))

    @jax.jit
    def run(params, ids, mask):
        def one(args):
            i, m = args
            return apply_fn(params, i, m).astype(dtype)

        return jax.lax.map(one, (ids, mask))

    out = run(params, ids, mask).reshape(n_chunks * chunk, -1)
    return out[:n]


def compute_embeddings_to_host(
    apply_fn: typ.Callable[[typ.Any, jax.Array, jax.Array], jax.Array],
    params: typ.Any,
    ids_np: typ.Any,  # numpy [N, L] host token ids (int16/int32)
    mask_np: typ.Optional[typ.Any] = None,  # numpy [N, L]; None = ids != 0
    *,
    chunk: int = 512,
    slab: int = 131_072,
    out: typ.Any = None,  # preallocated numpy [N, H] to fill (optional)
    out_dtype: typ.Any = None,  # numpy dtype, default float32
) -> typ.Any:
    """Embed a corpus LARGER than HBM: stream host token slabs through the
    jitted encoder, collecting float vectors into host RAM. Returns numpy [N, H].

    Parity: the reference predict loop streams batch embeddings to a tensorstore
    (`predict/compute.py:119`) precisely because the full matrix may not fit on
    one device; this is the TPU equivalent (device->host copy per slab, encoder
    compiled ONCE for a fixed [slab/chunk, chunk, L] shape). The result feeds
    `build_dense_from_host` so only compressed codes land in HBM
    (VERDICT r2 #2: 8.8M x 768 f32 = 27GB > 16GB v5e HBM).
    """
    import numpy as np

    n, seq = ids_np.shape
    slab = min(slab, -(-n // chunk) * chunk)
    slab = -(-slab // chunk) * chunk  # multiple of chunk
    n_chunks = slab // chunk

    @jax.jit
    def run(params, ids, mask):
        def one(args):
            i, m = args
            return apply_fn(params, i.astype(jnp.int32), m.astype(jnp.int32))

        return jax.lax.map(one, (ids.reshape(n_chunks, chunk, seq), mask.reshape(n_chunks, chunk, seq)))

    out_np = out
    dim = None
    for s0 in range(0, n, slab):
        ids_slab = np.asarray(ids_np[s0 : s0 + slab])
        if ids_slab.shape[0] < slab:  # last partial slab: pad rows
            pad = slab - ids_slab.shape[0]
            ids_slab = np.concatenate([ids_slab, np.zeros((pad, seq), ids_slab.dtype)])
        mask_slab = (
            np.asarray(mask_np[s0 : s0 + slab]) if mask_np is not None else (ids_slab != 0)
        )
        if mask_slab.shape[0] < slab:
            mask_slab = np.concatenate(
                [mask_slab, np.zeros((slab - mask_slab.shape[0], seq), mask_slab.dtype)]
            )
        vecs = np.asarray(run(params, jnp.asarray(ids_slab), jnp.asarray(mask_slab)))
        vecs = vecs.reshape(slab, -1)
        if out_np is None:
            dim = vecs.shape[-1]
            out_np = np.empty((n, dim), out_dtype or np.float32)
        take = min(slab, n - s0)
        out_np[s0 : s0 + take] = vecs[:take]
    return out_np


def cached_embeddings(
    apply_fn: typ.Callable[[typ.Any, jax.Array, jax.Array], jax.Array],
    params: typ.Any,
    corpus: DeviceCorpus,
    *,
    cache_dir: str,
    dataset_fingerprint: str,
    chunk: int = 512,
) -> jax.Array:
    """Fingerprint-keyed embedding cache with tensorstore spill.

    Parity: reference `Predict` (`predict/interface.py:27`) — the store is keyed
    by (dataset, model-weights, collate) fingerprints (`predict/fingerprint.py:12`),
    reused across restarts, validated by zero-vector probing (`interface.py:191`),
    and recomputed when invalid.
    """
    import numpy as np

    from vod_tpu.types.lazy import TensorStoreFactory
    from vod_tpu.utils.cache import cached_artifact_path
    from vod_tpu.utils.fingerprint import fingerprint, fingerprint_params

    probe = apply_fn(params, corpus.input_ids[:1], corpus.attention_mask[:1])
    dim = int(probe.shape[-1])
    fp = fingerprint(
        {"dataset": dataset_fingerprint, "params": fingerprint_params(params), "dim": dim}
    )
    path = cached_artifact_path(cache_dir, "vectors", fp)
    factory = TensorStoreFactory(path, (corpus.size, dim))
    if factory.exists():
        store = factory.open()
        vecs = np.asarray(store.read().result())
        # zero-vector probe: recompute when holes are found (`interface.py:191-216`)
        n_zero = int((np.abs(vecs).sum(axis=-1) == 0).sum())
        if n_zero == 0:
            return jax.numpy.asarray(vecs)
    emb = compute_embeddings(apply_fn, params, corpus, chunk=chunk)
    store = factory.instantiate()
    store.write(np.asarray(emb, dtype=np.float32)).result()
    return emb
