"""BASELINE config #3: hybrid dense+BM25 with subset filtering, index sharded
over 2 devices.

No multi-chip hardware exists in this environment, so this runs on a 2-device
virtual CPU mesh (the same mechanism the driver's `dryrun_multichip` uses) and
reports correctness (sharded == unsharded ids) plus the sharded/unsharded
latency ratio. Invoked by bench.py as a subprocess with JAX_PLATFORMS=cpu.

On the ratio (`vs_baseline` ~0.8, not ~1.0): profiled decomposition (r4) —
the ALGORITHMIC overhead of sharding (two per-shard top-ks + cross-shard
merge instead of one top-k) is <= 0 here: scanning the two halves serially
and merging in plain jit measured FASTER than the single full scan (308 vs
339 ms on the dense engine alone), and `shard_map` over a 1-DEVICE mesh
matches unsharded (291 ms). The ~20% only appears with 2 virtual devices
time-slicing ONE physical core (346 ms): XLA-CPU runs each partition in its
own thread and synchronizes them at every emulated collective, so the
single-core host pays thread ping-pong that real multi-chip ICI does not —
on real hardware each shard also has its own chip, halving the scan wall.
The assertion below bounds the artifact rather than demanding ratio ~1 on a
mesh that cannot deliver it by construction.

Run standalone:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      python examples/hybrid_sharded_bench.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    import jax

    # sitecustomize imports jax before this file's env lines run; the backend
    # initializes lazily, so forcing the platform here still wins (conftest.py
    # uses the same trick)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import (
        HybridEngines,
        SearchQueries,
        build_dense_index,
        build_sharded_dense_index,
        build_sparse_index_native,
        hybrid_search,
        shard_sparse_index,
    )

    assert len(jax.devices()) >= 2, jax.devices()
    mesh = make_mesh((2,), ("shard",))
    rng = np.random.default_rng(0)
    n, d, b, k, n_terms = 100_000, 256, 256, 10, 30_000
    corpus = rng.standard_normal((n, d), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    subsets = rng.integers(0, 8, size=n).astype("int32")
    doc_terms = [rng.integers(0, n_terms, size=12).tolist() for _ in range(n)]
    print(f"# corpus {n}x{d}, {n_terms} terms, B={b}", flush=True)

    t0 = time.time()
    sparse = build_sparse_index_native(
        doc_terms, n_terms=n_terms, max_postings=256, subset_ids=subsets
    )
    sparse_build_s = time.time() - t0
    dense_flat = build_dense_index(
        jnp.asarray(corpus), subset_ids=jnp.asarray(subsets), dtype="bfloat16"
    )
    unsharded = HybridEngines(dense=dense_flat, sparse=sparse)
    sharded = HybridEngines(
        dense=build_sharded_dense_index(
            jnp.asarray(corpus), mesh, dtype="bfloat16", subset_ids=jnp.asarray(subsets)
        ),
        sparse=shard_sparse_index(sparse, mesh),
    )

    q_vec = corpus[rng.choice(n, b, replace=False)] + 0.05 * rng.standard_normal((b, d)).astype(np.float32)
    q = SearchQueries(
        vector=jnp.asarray(q_vec / np.linalg.norm(q_vec, axis=1, keepdims=True)),
        terms=jnp.asarray(rng.integers(0, n_terms, size=(b, 6)).astype("int32")),
        subset_ids=jnp.asarray(np.stack([rng.permutation(8)[:4] for _ in range(b)]).astype("int32")),
    )

    def run(engines):
        f = jax.jit(lambda qv, qt, qs: hybrid_search(
            engines, SearchQueries(vector=qv, terms=qt, subset_ids=qs), top_k=k
        )[0].indices)
        out = np.asarray(f(q.vector, q.terms, q.subset_ids))  # warm
        t0 = time.time()
        for i in range(3):
            out = np.asarray(f(q.vector + 1e-5 * (i + 1), q.terms, q.subset_ids))
        return out, (time.time() - t0) / 3

    ref_i, t_un = run(unsharded)
    got_i, t_sh = run(sharded)

    # subset-filter correctness + sharded==unsharded agreement (bf16 ties may
    # flip the tail; require >=9/10 overlap per query)
    overlaps = []
    allowed_np = np.asarray(q.subset_ids)
    for i in range(b):
        got_set = {x for x in got_i[i].tolist() if x >= 0}
        for x in got_set:
            assert subsets[x] in allowed_np[i], (i, x)
        ref_set = {x for x in ref_i[i].tolist() if x >= 0}
        overlaps.append(len(got_set & ref_set) / max(len(ref_set), 1))
    agreement = float(np.mean(overlaps))
    assert agreement >= 0.9, agreement
    # virtual-mesh artifact bound (see module docstring): two partitions on
    # one physical core cost ~20% thread ping-pong; anything worse than 40%
    # would indicate a real regression in the sharded program itself
    assert t_un / t_sh >= 0.6, (t_un, t_sh)

    result = {
        "metric": (
            f"hybrid dense+BM25 sharded over {mesh.shape['shard']} devices (100k x 256 + "
            f"30k-term postings, subset-filtered, agreement {agreement:.3f}, "
            f"sparse build {sparse_build_s:.1f}s)"
        ),
        "value": round(b / t_sh, 1),
        "unit": "QPS (2-dev virtual CPU mesh)",
        "vs_baseline": round(t_un / t_sh, 3),  # >=~1 means sharding costs nothing
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
