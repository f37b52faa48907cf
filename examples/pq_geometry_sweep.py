"""PQ geometry sweep at 8.8M: subquantizer count M vs recall/QPS with refine.

Hypothesis (measured in `pq_8m8_bench.py`): the exhaustive-ADC one-hot decode
is MXU-lane-bound — the decode einsum is M batched [c,256]x[256, dsub=768/M]
matmuls, and dsub < 128 wastes output lanes (pq64 -> dsub 12 -> ~9% lane
utilization). Fewer, wider subquantizers (pq24 -> dsub 32) decode ~3x more
efficiently AND shrink the [chunk, M, 256] one-hot temp; with an exact refine
stage fixing the final order, the ADC stage only needs CANDIDATE recall over
the k_factor*k pool, which is far more forgiving than recall@10.

Sweeps M x k_factor over the SAME spectrum-matched 8.8M corpus + one shared
PCA-128 int8 refine store. Run: python examples/pq_geometry_sweep.py
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_841_823)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--m_list", type=str, default="16,24,32,64")
    ap.add_argument("--k_factors", type=str, default="16,32")
    ap.add_argument("--refine_dim", type=int, default=128)
    ap.add_argument("--train", type=int, default=262_144)
    ap.add_argument("--kmeans_iters", type=int, default=6)
    ap.add_argument("--n_eval", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vod_tpu.ops import pq as pq_ops
    from vod_tpu.search import SearchQueries
    from vod_tpu.search.dense import PQIndex, pq_search

    n, d, rdim, k = args.n, args.d, args.refine_dim, 10
    m_list = [int(x) for x in args.m_list.split(",")]
    k_factors = [int(x) for x in args.k_factors.split(",")]
    n_slabs = 8
    slab = -(-(-(-n // n_slabs)) // 8192) * 8192
    n_pad = slab * n_slabs

    spec = jnp.exp(-jnp.arange(d) / 35.0).astype(jnp.float32)
    basis, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(99), (d, d)))
    basis = basis.astype(jnp.float32)

    # NOTE (remote-relay): basis/codebooks ride as jit ARGUMENTS — closures
    # embed as program literals, shipped at ~100 s/MB per compile (bench.py).
    @jax.jit
    def gen_slab(key, basis):
        z = jax.random.normal(key, (slab, d), dtype=jnp.float32) * spec
        x = z @ basis
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    keys = [jax.random.PRNGKey(2000 + i) for i in range(n_slabs)]

    # shared refine store (trained once)
    t0 = time.time()
    train = gen_slab(keys[0], basis)[: args.train]
    refine_proj, _mean = pq_ops.train_projection(train, rdim)
    ref_sample = train @ refine_proj
    refine_scale = jnp.maximum(jnp.max(jnp.abs(ref_sample), axis=0, keepdims=True), 1e-8) / 127.0
    del ref_sample

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill_refine(refine, key, row0, basis, refine_proj, refine_scale):
        x = gen_slab(key, basis)
        r = jnp.clip(jnp.round((x @ refine_proj) / refine_scale), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(refine, r, (row0, 0))

    refine = jnp.zeros((n_pad, rdim), jnp.int8)
    for i, kk in enumerate(keys):
        refine = fill_refine(refine, kk, jnp.int32(i * slab), basis, refine_proj, refine_scale)
    refine.block_until_ready()
    print(f"# refine store built in {time.time()-t0:.0f}s", flush=True)

    # queries + exact f32 ground truth (slab-regenerated running top-k)
    rng = np.random.default_rng(0)
    s0 = np.asarray(gen_slab(keys[0], basis)[: args.n_eval])
    # noise is spectrum-shaped AND rotated through `basis` like the corpus:
    # real queries are encoder outputs on the same manifold (unrotated noise
    # puts energy off-manifold and pessimizes subspace codecs)
    noise = (rng.standard_normal((args.n_eval, d)).astype(np.float32)
             * np.asarray(spec)) @ np.asarray(basis)
    q = s0 + 0.1 * noise
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    jq = jnp.asarray(q)

    @jax.jit
    def gt_slab(key, top_s, top_i, offset, jq, basis):
        x = gen_slab(key, basis)
        s = jnp.dot(jq, x.T, preferred_element_type=jnp.float32)
        row = offset + jax.lax.broadcasted_iota(jnp.int32, (1, slab), 1)
        s = jnp.where(row < n, s, -jnp.inf)
        c_s, c_pos = jax.lax.top_k(s, k)
        all_s = jnp.concatenate([top_s, c_s], axis=-1)
        all_i = jnp.concatenate([top_i, offset + c_pos], axis=-1)
        new_s, pos = jax.lax.top_k(all_s, k)
        return new_s, jnp.take_along_axis(all_i, pos, axis=-1)

    top_s = jnp.full((args.n_eval, k), -jnp.inf)
    top_i = jnp.full((args.n_eval, k), -1, jnp.int32)
    for i, kk in enumerate(keys):
        top_s, top_i = gt_slab(kk, top_s, top_i, jnp.int32(i * slab), jq, basis)
    gt_i = np.asarray(top_i)
    print("# ground truth done", flush=True)

    def make_queries(nq, seed=0):
        r = np.random.default_rng(seed)
        base = np.tile(q, (-(-nq // args.n_eval), 1))[:nq]
        out_q = base + 1e-3 * r.standard_normal((nq, d)).astype(np.float32)
        return out_q / np.linalg.norm(out_q, axis=1, keepdims=True)

    small, block, blocks = 256, 2048, 4
    p1 = [jnp.asarray(make_queries(small, seed=i)) for i in range(3)]
    p2 = [jnp.asarray(np.stack([make_queries(block, seed=50 + 7 * i + j) for j in range(blocks)]))
          for i in range(3)]

    def search_fn(index, qv, top_k=k):
        return pq_search(index, SearchQueries(vector=qv), top_k).indices

    for m in m_list:
        t0 = time.time()
        codebooks = pq_ops.train_pq(jax.random.PRNGKey(0), train, m, n_iters=args.kmeans_iters)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fill_codes(codes, key, row0, cb, basis):
            x = gen_slab(key, basis)
            return jax.lax.dynamic_update_slice(codes, pq_ops.encode_pq(cb, x), (row0, 0))

        codes = jnp.zeros((n_pad, m), jnp.uint8)
        for i, kk in enumerate(keys):
            codes = fill_codes(codes, kk, jnp.int32(i * slab), codebooks, basis)
        codes.block_until_ready()
        build_s = time.time() - t0

        for kf in k_factors:
            index = PQIndex(
                codebooks=codebooks, codes=codes,
                refine_codes=refine, refine_scale=refine_scale, refine_proj=refine_proj,
                n_real=n, k_factor=kf, approx_recall=0.95,
            )
            f = jax.jit(search_fn)
            got = np.asarray(f(index, jq))
            recall = float(np.mean(
                [len(set(got[i].tolist()) & set(gt_i[i].tolist())) / k
                 for i in range(args.n_eval)]
            ))
            fb = jax.jit(lambda idx, qb: jax.lax.map(lambda v: search_fn(idx, v), qb))
            np.asarray(f(index, p1[0])[0, 0])
            np.asarray(fb(index, p2[0])[0, 0, 0])
            w1 = w2 = float("inf")
            for i in range(3):
                t = time.time(); np.asarray(f(index, p1[i])[-1]); w1 = min(w1, time.time() - t)
                t = time.time(); np.asarray(fb(index, p2[i])[-1, -1]); w2 = min(w2, time.time() - t)
            qps = (blocks * block - small) / max(w2 - w1, 1e-9)
            print(json.dumps({
                "codec": f"pq{m}+pca{rdim}:exh+ref", "dsub": d // m, "n": n,
                "bytes_per_vec": m + rdim, "k_factor": kf,
                "recall10": round(recall, 4), "qps": round(qps), "build_s": round(build_s, 1),
            }), flush=True)
        del codes


if __name__ == "__main__":
    main()
