"""Jitted k-means (Lloyd iterations) for IVF coarse quantizers and PQ codebooks.

Parity: the reference trains k-means inside faiss (C++/GPU clustering,
`faiss_search/build_gpu.py:103-144`); here it is a pure-JAX program: chunked
assignment (lax.map over query blocks keeps the [n, k] distance matrix bounded)
+ segment-sum centroid update, all on the MXU.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp


def _assign_chunked(x: jax.Array, centroids: jax.Array, chunk: int = 4096) -> jax.Array:
    """Nearest-centroid assignment, chunked over rows to bound memory.

    Uses the ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 expansion; the x.c term is a
    matmul (MXU), ||x||^2 is irrelevant for the argmin.
    """
    n = x.shape[0]
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=-1)  # [k]

    n_chunks = max(1, (n + chunk - 1) // chunk)
    pad = n_chunks * chunk - n
    x_pad = jnp.pad(x, ((0, pad), (0, 0)))
    x_chunks = x_pad.reshape(n_chunks, chunk, x.shape[-1])

    def one(xc: jax.Array) -> jax.Array:
        ip = jnp.dot(xc, centroids.T, preferred_element_type=jnp.float32)  # [chunk, k]
        d = c_sq[None, :] - 2.0 * ip
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    assign = jax.lax.map(one, x_chunks).reshape(-1)
    return assign[:n]


def kmeans(
    rng: jax.Array,
    x: jax.Array,
    n_clusters: int,
    n_iters: int = 10,
    chunk: int = 4096,
    init: typ.Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Lloyd k-means. Returns (centroids [k, d] f32, assignments [n] i32).

    Init: random distinct-ish sample of rows (parity with faiss's default
    sampling init; kmeans++ is overkill at IVF scales where n >> k), or
    `init` [k, d] to warm-start (OPQ alternation refreshes codebooks from the
    previous iterate rather than re-randomizing).
    Empty clusters are re-seeded from random points each iteration.
    """
    n, d = x.shape
    x = x.astype(jnp.float32)
    if init is not None:
        centroids = init.astype(jnp.float32)
    else:
        # with-replacement fallback when n < k (faiss proceeds with a warning
        # there too; duplicate centroids get re-seeded by the empty-cluster rule)
        init_idx = jax.random.choice(rng, n, shape=(n_clusters,), replace=n < n_clusters)
        centroids = x[init_idx]

    def step(carry, rng_i):
        centroids = carry
        assign = _assign_chunked(x, centroids, chunk=chunk)
        sums = jax.ops.segment_sum(x, assign, num_segments=n_clusters)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), assign, num_segments=n_clusters)
        new_c = sums / jnp.maximum(counts[:, None], 1.0)
        # Re-seed empty clusters from random data points.
        reseed_idx = jax.random.randint(rng_i, (n_clusters,), 0, n)
        new_c = jnp.where((counts > 0)[:, None], new_c, x[reseed_idx])
        return new_c, None

    rngs = jax.random.split(rng, n_iters)
    centroids, _ = jax.lax.scan(step, centroids, rngs)
    assign = _assign_chunked(x, centroids, chunk=chunk)
    return centroids, assign


def infer_n_clusters(n_vectors: int) -> int:
    """`IVFauto` heuristic: ~sqrt(n), clamped (parity: reference
    `faiss_search/support.py:13` `infer_factory_centroids`)."""
    return int(max(1, min(2 ** 16, round(float(n_vectors) ** 0.5))))


def kmeans_sharded(
    rng: jax.Array,
    x: jax.Array,
    n_clusters: int,
    mesh,
    *,
    axis: str = "shard",
    n_iters: int = 10,
    chunk: int = 4096,
    init: typ.Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Multi-device Lloyd iterations over a row-sharded training set.

    Parity: faiss's multi-GPU clustering (`build_gpu.py:103-144` trains the
    coarse quantizer on GPU shards). TPU-first shape: rows are sharded over
    the mesh axis, each device computes local assignments + local segment
    sums/counts, and ONE psum of the [k, d] sums + [k] counts per iteration
    crosses ICI — never the assignments or distances. Centroids stay
    replicated, so every shard runs an identical update (bitwise-identical
    across shards by SPMD determinism). Empty clusters are re-seeded from a
    globally-indexed random row (the owning shard contributes it via psum).

    Returns (centroids [k, d] f32 replicated, assignments [n] i32).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, d = x.shape
    n_shards = mesh.shape[axis]
    x = x.astype(jnp.float32)
    if init is not None:
        centroids = init.astype(jnp.float32)
    else:
        init_idx = jax.random.choice(rng, n, shape=(n_clusters,), replace=n < n_clusters)
        centroids = x[init_idx]

    pad = (-n) % n_shards
    x_pad = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    rows = (n + pad) // n_shards
    xs = jax.device_put(x_pad, NamedSharding(mesh, P(axis, None)))
    cent0 = jax.device_put(centroids, NamedSharding(mesh, P()))
    # same reseed stream as the single-device `kmeans` (split(rng), no fold_in)
    # so sharded == unsharded holds even when a cluster goes empty mid-run
    rngs = jax.random.split(rng, n_iters)

    def local_fn(xl, cent, rr):
        my = jax.lax.axis_index(axis)
        g0 = my * rows
        valid = (g0 + jnp.arange(rows, dtype=jnp.int32)) < n

        def step(c, r):
            a = _assign_chunked(xl, c, chunk=chunk)
            w = valid.astype(jnp.float32)
            sums = jax.ops.segment_sum(xl * w[:, None], a, num_segments=n_clusters)
            counts = jax.ops.segment_sum(w, a, num_segments=n_clusters)
            sums = jax.lax.psum(sums, axis)
            counts = jax.lax.psum(counts, axis)
            new_c = sums / jnp.maximum(counts[:, None], 1.0)
            # re-seed empty clusters from a global random row: the owning
            # shard contributes it, the psum broadcasts it
            reseed = jax.random.randint(r, (n_clusters,), 0, n)
            loc = reseed - g0
            own = (loc >= 0) & (loc < rows)
            seed_rows = jnp.where(
                own[:, None], xl[jnp.clip(loc, 0, rows - 1)], 0.0
            )
            seed_rows = jax.lax.psum(seed_rows, axis)
            return jnp.where((counts > 0)[:, None], new_c, seed_rows), None

        c, _ = jax.lax.scan(step, cent, rr)
        a = _assign_chunked(xl, c, chunk=chunk)
        return c, jax.lax.all_gather(a, axis).reshape(-1)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    centroids, assign = fn(xs, cent0, rngs)
    return centroids, assign[:n]
