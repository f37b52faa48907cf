"""8.8M-scale B=64 serving shootout: the coarse→refine direct codec vs
IVF-PQ probing vs the exhaustive pq4fs scan.

The VERDICT r3 #1 target: a >=0.95-recall@10 operating point at 8.8M, B=64,
materially faster than the exhaustive scan's ~0.95-recall serving rate.

Why the direct codec should win at serving batch (B=64):
  * exhaustive pq4fs+refine: per dispatch the ENTIRE corpus is one-hot
    decoded — the [chunk, M, 16] temps are written+read through HBM every
    chunk (~16x the code bytes), a fixed ~35 GB of traffic amortized over
    just 64 queries.
  * ivfpq gathered windows: per-QUERY window gathers cost B x probed_rows x
    row_bytes (~3.8 GB at nprobe=32 spilled) — the pruning factor is
    cancelled by the per-query gather.
  * coarse→refine direct: ONE int8 MXU matmul over the [N, dc] coarse store
    (8.8M x 128 B = 1.1 GB read once, shared by all 64 queries) + a tiny
    [B, k_factor*k, R] refine gather. No decode temps, no per-query gathers.

Corpus/GT recipe matches bench.py's msmarco config exactly (spectrum-matched
device-generated slabs, exact f32 ground truth by slab regeneration).

Usage (real TPU):  python examples/serving_codec_bench.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from vod_tpu.ops import pq as pq_ops
from vod_tpu.search import SearchQueries
from vod_tpu.search.dense import PQIndex, pq_search

N, D, K = 8_841_823, 768, 10
B = 64  # serving block
COARSE_DIM, REFINE_DIM = 128, 256


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    slab = -(-(-(-N // 8)) // 8192) * 8192
    n_pad = slab * 8
    spec_np = np.exp(-np.arange(D) / 35.0).astype(np.float32)
    spec = jnp.asarray(spec_np)
    basis, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(99), (D, D)))
    basis = basis.astype(jnp.float32)

    # NOTE (remote-relay): spec/basis ride as jit ARGUMENTS, never closures —
    # a closed-over device array is embedded in the program as a literal, and
    # this environment's remote-compile relay ships literals at ~100 s/MB
    # (measured: one 2.3 MB literal = 252 s compile; same program with the
    # array as a parameter = 1.6 s).
    @jax.jit
    def gen_slab(key, spec, basis):
        z = jax.random.normal(key, (slab, D), dtype=jnp.float32) * spec
        x = z @ basis
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    keys = [jax.random.PRNGKey(1000 + i) for i in range(8)]

    # ---- train the two projections + scales on a slab-0 sample -------------
    log("training coarse/refine PCA projections")
    train = gen_slab(keys[0], spec, basis)[:262_144]
    proj_c, _ = pq_ops.train_projection(train, COARSE_DIM)
    cs = train @ proj_c
    coarse_scale = jnp.maximum(jnp.max(jnp.abs(cs), axis=0, keepdims=True), 1e-8) / 127.0
    proj_r, _ = pq_ops.train_projection(train, REFINE_DIM)
    rs = train @ proj_r
    refine_scale = jnp.maximum(jnp.max(jnp.abs(rs), axis=0, keepdims=True), 1e-8) / 127.0
    del train, cs, rs

    # ---- encode slabs into the two stores (donated updates) ----------------
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill(coarse, refine, key, row0, spec, basis, proj_c, coarse_scale, proj_r, refine_scale):
        x = gen_slab(key, spec, basis)
        c = jnp.clip(jnp.round((x @ proj_c) / coarse_scale), -127, 127).astype(jnp.int8)
        r = jnp.clip(jnp.round((x @ proj_r) / refine_scale), -127, 127).astype(jnp.int8)
        return (
            jax.lax.dynamic_update_slice(coarse, c, (row0, 0)),
            jax.lax.dynamic_update_slice(refine, r, (row0, 0)),
        )

    log(f"encoding {n_pad} rows into pca{COARSE_DIM} coarse + pca{REFINE_DIM} refine")
    t0 = time.time()
    coarse = jnp.zeros((n_pad, COARSE_DIM), jnp.int8)
    refine = jnp.zeros((n_pad, REFINE_DIM), jnp.int8)
    for i, kk in enumerate(keys):
        coarse, refine = fill(coarse, refine, kk, jnp.int32(i * slab),
                              spec, basis, proj_c, coarse_scale, proj_r, refine_scale)
    coarse.block_until_ready()
    build_s = time.time() - t0
    log(f"stores built in {build_s:.0f}s "
        f"({(n_pad * (COARSE_DIM + REFINE_DIM)) / 2**30:.2f} GB HBM)")

    # ---- queries + exact f32 ground truth (bench.py recipe) ----------------
    n_eval = 64
    s0 = np.asarray(gen_slab(keys[0], spec, basis)[:n_eval])
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal((n_eval, D)).astype(np.float32) * spec_np) @ np.asarray(basis)
    q = s0 + 0.1 * noise
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    jq = jnp.asarray(q)

    @jax.jit
    def gt_slab(key, top_s, top_i, offset, jq, spec, basis):
        x = gen_slab(key, spec, basis)
        s = jnp.dot(jq, x.T, preferred_element_type=jnp.float32)
        row = offset + jax.lax.broadcasted_iota(jnp.int32, (1, slab), 1)
        s = jnp.where(row < N, s, -jnp.inf)
        c_s, c_pos = jax.lax.top_k(s, K)
        all_s = jnp.concatenate([top_s, c_s], axis=-1)
        all_i = jnp.concatenate([top_i, offset + c_pos], axis=-1)
        new_s, pos = jax.lax.top_k(all_s, K)
        return new_s, jnp.take_along_axis(all_i, pos, axis=-1)

    top_s = jnp.full((n_eval, K), -jnp.inf)
    top_i = jnp.full((n_eval, K), -1, jnp.int32)
    log("exact f32 ground truth")
    for i, kk in enumerate(keys):
        top_s, top_i = gt_slab(kk, top_s, top_i, jnp.int32(i * slab), jq, spec, basis)
    gt_i = np.asarray(top_i)

    def recall_of(got):
        return float(np.mean(
            [len(set(got[i].tolist()) & set(gt_i[i].tolist())) / K for i in range(n_eval)]
        ))

    def make_queries(nq, seed=0):
        r = np.random.default_rng(seed)
        base = np.tile(q, (-(-nq // n_eval), 1))[:nq]
        out_q = base + 1e-3 * r.standard_normal((nq, D)).astype(np.float32)
        return out_q / np.linalg.norm(out_q, axis=1, keepdims=True)

    def serve_ms(index, sfn):
        """Marginal 64-query block: 9-block vs 1-block lax.map walls."""
        p_one = [jnp.asarray(make_queries(B, seed=100 + i)[None]) for i in range(3)]
        p_nine = [
            jnp.asarray(np.stack([make_queries(B, seed=200 + 9 * i + j) for j in range(9)]))
            for i in range(3)
        ]
        fb = jax.jit(lambda ix, qb: jax.lax.map(lambda v: sfn(ix, v), qb))
        np.asarray(fb(index, p_one[0])[0, 0, 0])
        np.asarray(fb(index, p_nine[0])[0, 0, 0])
        w1 = w9 = float("inf")
        for i in range(3):
            t = time.time(); np.asarray(fb(index, p_one[i])[-1, -1]); w1 = min(w1, time.time() - t)
            t = time.time(); np.asarray(fb(index, p_nine[i])[-1, -1]); w9 = min(w9, time.time() - t)
        # below the relay noise floor the marginal is meaningless (it printed
        # a 64e9-QPS artifact once); fall back to the conservative amortized
        # per-block wall like bench.py's _serve_ms_block
        marginal = (w9 - w1) / 8 * 1000
        amortized = w9 / 9 * 1000
        return marginal if marginal >= amortized / 4 else amortized

    sfn = lambda ix, v: pq_search(ix, SearchQueries(vector=v), K).indices
    results = []
    # (kernel, k_factor, fused_bins): the scan sweep maps the recall/QPS
    # frontier; the fused variants route the coarse stage through the Pallas
    # matmul+binned-top-k kernel (scores never round-trip HBM — the scan's
    # per-chunk score traffic ~doubles the 1.1 GB coarse read at B=64).
    # Larger bins buy candidate recall (pool loss ~ (pool-1)/(2*bins)) at
    # negligible cost, so fused arms pair wider pools with wider bins.
    # tile=16384 is the measured HBM-roofline point for the fused coarse
    # kernel at this shape (kernel-only sweep: tile 2048 -> ~2.3 ms/block,
    # tile 16384 -> ~1.2 ms = ~890 GB/s effective read bandwidth).
    variants = [
        ("scan", 8, 0, 0), ("scan", 16, 0, 0), ("scan", 32, 0, 0),
        ("fused", 16, 2048, 0), ("fused", 16, 2048, 16384),
        ("fused", 32, 2048, 16384), ("fused", 16, 4096, 16384),
        ("fused", 32, 4096, 16384),
    ]
    for kern, kf, bins, tile in variants:
        index = PQIndex(
            codebooks=jnp.zeros((1, 1, 1), jnp.float32), codes=None,
            coarse_codes=coarse, coarse_scale=coarse_scale, proj=proj_c,
            refine_codes=refine, refine_scale=refine_scale, refine_proj=proj_r,
            n_real=N, k_factor=kf, approx_recall=0.95,
            kernel=kern, fused_bins=bins or 512, fused_tile=tile,
        )
        got = np.asarray(jax.jit(sfn)(index, jq))
        rec = recall_of(got)
        ms = serve_ms(index, sfn)
        qps = B / (ms / 1000)
        tag = f"{kern}" + (f" bins={bins} tile={tile or 'auto'}" if kern == "fused" else "")
        log(f"direct pca{COARSE_DIM}+ref{REFINE_DIM} kf={kf} [{tag}]: "
            f"recall@10={rec:.4f} {ms:.2f} ms/block = {qps:,.0f} QPS")
        results.append({"codec": "direct", "kernel": kern, "k_factor": kf,
                        "fused_bins": bins, "fused_tile": tile, "recall": round(rec, 4),
                        "ms_block": round(ms, 2), "qps": round(qps, 1)})

    print(json.dumps({"n": N, "B": B, "coarse_dim": COARSE_DIM,
                      "refine_dim": REFINE_DIM, "build_s": round(build_s, 1),
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
