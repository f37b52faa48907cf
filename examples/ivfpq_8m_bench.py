"""IVF serving-path benchmark at 8.8M (the small-batch answer to pq4fs).

Measures `IVFPQIndex` in its production configuration — refine rows as the
scoring store (`keep_codes=False`: IVF + truncated-PCA int8 rows at
refine_dim + 4 B/vec) — against the exhaustive pq128x4fs+refine scan's
measured 61 ms per 64-query block (1,045 QPS serving) and 12.2k QPS at
4x2048 throughput (examples/pq4_adc_variants_bench.py, bench.py msmarco).

Why this wins at small batch: the exhaustive scan's decode cost is shared
across the batch but fixed per pass; IVF scans only the probed cells'
windows, gathering R bytes/row of rerank rows per (query, row). At B=64,
nprobe=64/4096 the gather is ~2 GB vs the scan's fixed ~20 GB of one-hot
decode traffic.

Corpus/GT identical to bench.py msmarco: spectrum-matched rows generated
slab-wise on device, exact-f32 ground truth by PRNG slab regeneration.

Run: python examples/ivfpq_8m_bench.py [--n 8841823] [--nprobes 16,32,64,128]
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
    ap.add_argument("--c", type=int, default=4096)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--refine_dim", type=int, default=128)
    ap.add_argument("--train", type=int, default=262_144)
    ap.add_argument("--kmeans_iters", type=int, default=8)
    ap.add_argument("--n_eval", type=int, default=64)
    ap.add_argument("--nprobes", type=str, default="16,32,64,128")
    ap.add_argument("--spill", action="store_true",
                    help="SOAR secondary assignments (2x rows, recall at equal nprobe)")
    ap.add_argument("--soar_lambda", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vod_tpu.ops import pq as pq_ops
    from vod_tpu.ops.kmeans import _assign_chunked, kmeans
    from vod_tpu.search import SearchQueries, build_ivfpq_from_device_parts, ivfpq_search
    from vod_tpu.search.ivfpq import assign_soar

    n, d, k = args.n, args.d, 10
    n_slabs = 8
    slab = -(-(-(-n // n_slabs)) // 16384) * 16384
    n_pad = slab * n_slabs

    spec_np = np.exp(-np.arange(d) / 35.0).astype(np.float32)
    spec = jnp.asarray(spec_np)
    basis, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(99), (d, d)))
    basis = basis.astype(jnp.float32)

    # spec/basis/centroids/etc ride as jit ARGUMENTS (remote relay ships
    # closed-over literals at ~100 s/MB per compile; see bench.py NOTE)
    @jax.jit
    def gen_slab(key, spec, basis):
        z = jax.random.normal(key, (slab, d), dtype=jnp.float32) * spec
        x = z @ basis
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    keys = [jax.random.PRNGKey(2000 + i) for i in range(n_slabs)]

    t0 = time.time()
    train = gen_slab(keys[0], spec, basis)[: args.train]
    refine_proj, _mean = pq_ops.train_projection(train, args.refine_dim)
    ref_sample = train @ refine_proj
    refine_scale = (
        jnp.maximum(jnp.max(jnp.abs(ref_sample), axis=0, keepdims=True), 1e-8) / 127.0
    )
    centroids, _ = kmeans(
        jax.random.PRNGKey(7), train, n_clusters=args.c, n_iters=args.kmeans_iters
    )
    del train, ref_sample
    print(f"# trained pca{args.refine_dim} + kmeans{args.c} in {time.time()-t0:.0f}s", flush=True)


    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(refine_rows, key, row0, spec, basis, refine_proj, refine_scale):
        x = gen_slab(key, spec, basis)
        r = jnp.clip(jnp.round((x @ refine_proj) / refine_scale), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(refine_rows, r, (row0, 0))

    @jax.jit
    def assign_slab(key, spec, basis, centroids):
        x = gen_slab(key, spec, basis)
        a = _assign_chunked(x, centroids, chunk=16384)
        a2 = (
            assign_soar(x, centroids, a, soar_lambda=args.soar_lambda, chunk=4096)
            if args.spill else a
        )
        return a, a2

    t0 = time.time()
    refine_rows = jnp.zeros((n_pad, args.refine_dim), jnp.int8)
    assign_np = np.zeros((n_pad,), np.int32)
    assign2_np = np.zeros((n_pad,), np.int32) if args.spill else None
    for i, kk in enumerate(keys):
        refine_rows = fill(refine_rows, kk, jnp.int32(i * slab),
                           spec, basis, refine_proj, refine_scale)
        a, a2 = assign_slab(kk, spec, basis, centroids)
        assign_np[i * slab : (i + 1) * slab] = np.asarray(a)
        if args.spill:
            assign2_np[i * slab : (i + 1) * slab] = np.asarray(a2)
    refine_rows.block_until_ready()
    print(f"# encoded + assigned 8 slabs in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    assign_all, row_ids_np, refine_dev = assign_np[:n], None, refine_rows[:n]
    if args.spill:
        # SOAR duplication: same rerank rows under the secondary cells
        assign_all = np.concatenate([assign_np[:n], assign2_np[:n]])
        row_ids_np = np.tile(np.arange(n, dtype=np.int32), 2)
        refine_dev = jnp.concatenate([refine_rows[:n], refine_rows[:n]])
        del refine_rows
    index = build_ivfpq_from_device_parts(
        centroids,
        jnp.zeros((1, 1, d), jnp.float32),  # no PQ codes: refine rows score
        assign_all,
        None,
        refine_dev=refine_dev,
        refine_scale=refine_scale,
        refine_proj=refine_proj,
        window=args.window,
        nprobe=32,
        row_ids_np=row_ids_np,
        n_real=n,
        spilled=args.spill,
    )
    if not args.spill:
        del refine_rows
    del refine_dev
    total = int(index.row_ids.shape[0])
    wc_np = np.asarray(index.win_count)
    mean_w = float(wc_np[wc_np > 0].mean())
    gb = total * (args.refine_dim + 4) / 2**30
    print(
        f"# layout built in {time.time()-t0:.0f}s: {total} slots "
        f"({100*(total-n)/n:.1f}% padding), {gb:.2f} GB HBM, mean {mean_w:.1f} windows/cell",
        flush=True,
    )

    # eval queries + exact f32 GT (identical to bench.py msmarco)
    rng = np.random.default_rng(0)
    s0 = np.asarray(gen_slab(keys[0], spec, basis)[: args.n_eval])
    noise = (rng.standard_normal((args.n_eval, d)).astype(np.float32) * spec_np) @ np.asarray(basis)
    q = s0 + 0.1 * noise
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    jq = jnp.asarray(q)

    @jax.jit
    def gt_slab(key, top_s, top_i, offset, jq, spec, basis):
        x = gen_slab(key, spec, basis)
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
        top_s, top_i = gt_slab(kk, top_s, top_i, jnp.int32(i * slab), jq, spec, basis)
    gt_i = np.asarray(top_i)
    print("# ground truth done", flush=True)

    def make_queries(nq, seed=0):
        r = np.random.default_rng(seed)
        base = np.tile(q, (-(-nq // args.n_eval), 1))[:nq]
        out_q = base + 1e-3 * r.standard_normal((nq, d)).astype(np.float32)
        return out_q / np.linalg.norm(out_q, axis=1, keepdims=True)

    sb = 64
    p_small = [
        (jnp.asarray(make_queries(sb, seed=i)[None]),
         jnp.asarray(np.stack([make_queries(sb, seed=10 + 9 * i + j) for j in range(9)])))
        for i in range(3)
    ]
    small, block, blocks = 256, 2048, 4
    p1 = [jnp.asarray(make_queries(small, seed=i)) for i in range(3)]
    p2 = [jnp.asarray(np.stack([make_queries(block, seed=50 + 7 * i + j) for j in range(blocks)]))
          for i in range(3)]

    for nprobe in [int(p) for p in args.nprobes.split(",")]:
        mw = int(min(wc_np.sum(), nprobe * max(1, int(np.ceil(1.5 * mean_w)))))
        ix = index.replace(nprobe=nprobe, max_windows=mw)
        sfn = lambda ixx, v: ivfpq_search(ixx, SearchQueries(vector=v), k).indices

        got = np.asarray(jax.jit(sfn)(ix, jq))
        recall = float(np.mean(
            [len(set(got[i].tolist()) & set(gt_i[i].tolist())) / k
             for i in range(args.n_eval)]
        ))

        # serving: marginal 64-query block (9 vs 1 blocks, RTT cancelled)
        fb = jax.jit(lambda cc, qb: jax.lax.map(lambda v: sfn(cc, v), qb))
        np.asarray(fb(ix, p_small[0][0])[0, 0, 0])
        np.asarray(fb(ix, p_small[0][1])[0, 0, 0])
        w1 = w9 = float("inf")
        for i in range(3):
            one, nine = p_small[i]
            t = time.time(); np.asarray(fb(ix, one)[-1, -1]); w1 = min(w1, time.time() - t)
            t = time.time(); np.asarray(fb(ix, nine)[-1, -1]); w9 = min(w9, time.time() - t)
        ms_block = max((w9 - w1) / 8 * 1000, 1e-6)

        # throughput: 4x2048 blocks vs 256 (bench.py methodology)
        f = jax.jit(sfn)
        fb2 = jax.jit(lambda cc, qb: jax.lax.map(lambda v: sfn(cc, v), qb))
        np.asarray(f(ix, p1[0])[0, 0])
        np.asarray(fb2(ix, p2[0])[0, 0, 0])
        w1b = w2b = float("inf")
        for i in range(3):
            t = time.time(); np.asarray(f(ix, p1[i])[-1]); w1b = min(w1b, time.time() - t)
            t = time.time(); np.asarray(fb2(ix, p2[i])[-1, -1]); w2b = min(w2b, time.time() - t)
        tqps = (blocks * block - small) / max(w2b - w1b, 1e-9)

        print(json.dumps({
            "nprobe": nprobe, "max_windows": mw,
            "scan_frac": round(mw * args.window / n, 4),
            "recall10": round(recall, 4),
            "serving_ms_per_64": round(ms_block, 2),
            "serving_qps": round(sb / (ms_block / 1000)),
            "throughput_qps": round(tqps),
        }), flush=True)


if __name__ == "__main__":
    main()
