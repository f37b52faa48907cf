"""IVF-PQ vs serving-direct: the small-batch latency crossover at 8.8M.

VERDICT r4 #4: the ivfpq bench line shipped 0.845 recall@10 at 1.7k QPS (B=64)
— dominated at that operating point by the serving-direct codec (20.5k @
0.969). Cell pruning's remaining case is the LATENCY-BOUND regime: at B=1 the
exhaustive coarse scan still reads the full 1.1 GB pca128 store per dispatch,
while IVF touches only nprobe/4096 cells (~30 MB at nprobe=32). This script
measures that regime head-to-head and records the verdict:

  * marginal per-dispatch device ms at B in {1, 4, 8, 64} (k-block vs 1-block
    lax.map walls — the fixed relay RTT cancels) for
      - serving-direct (pca128-int8 coarse scan -> pca256-int8 exact rerank)
      - ivfpq-SOAR at nprobe in {16, 32, 64, 128, 256} (same pca128 stores,
        windowed, + the same pca256 IndexRefine rerank)
  * recall@10 vs exact f32 GT for every point (slab-regenerated GT — the
    27 GB f32 matrix never exists)
  * end-to-end p50/p99 through SearchServer+MicroBatcher (warmup applied) at
    B=1 for serving-direct and the best >=0.9-recall ivfpq point.

The decision rule (and what bench.py encodes): if NO ivfpq point with
recall@10 >= 0.9 beats serving-direct's dispatch ms at any B, ivfpq stays
demoted out of the per-round JSON (an engine, not a bench line).

Parity: faiss default factory `IVFauto,PQ...`
(/root/reference/src/vod_exps/hydra/datasets/search_defaults/faiss/default.yaml:2);
runtime nprobe tuning mirrors faiss ParameterSpace (search/autotune.py).

Usage (real TPU): python examples/ivfpq_crossover_bench.py [--n 8841823]
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

D, K = 768, 10


def log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def marginal_dispatch_ms(sfn, index, make_queries, sb, reps=3, blocks=9):
    """Marginal per-dispatch wall at batch `sb`: blocks-block vs 1-block
    lax.map (fixed relay RTT cancels); falls back to the amortized wall when
    the marginal dips under the noise floor (very cheap kernels)."""
    import jax
    import jax.numpy as jnp

    p_one = [jnp.asarray(make_queries(sb, seed=100 + i)[None]) for i in range(reps)]
    p_many = [
        jnp.asarray(np.stack([make_queries(sb, seed=200 + blocks * i + j) for j in range(blocks)]))
        for i in range(reps)
    ]
    fb = jax.jit(lambda ix, qb: jax.lax.map(lambda v: sfn(ix, v), qb))
    np.asarray(fb(index, p_one[0])[0, 0, 0])
    np.asarray(fb(index, p_many[0])[0, 0, 0])
    w1 = wn = float("inf")
    for i in range(reps):
        t = time.time(); np.asarray(fb(index, p_one[i])[-1, -1]); w1 = min(w1, time.time() - t)
        t = time.time(); np.asarray(fb(index, p_many[i])[-1, -1]); wn = min(wn, time.time() - t)
    marginal = (wn - w1) / (blocks - 1) * 1000
    amortized = wn / blocks * 1000
    return marginal if marginal >= amortized / 4 else amortized


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_841_823)
    ap.add_argument("--n_eval", type=int, default=64)
    ap.add_argument("--skip_http", action="store_true")
    args = ap.parse_args()
    n, n_eval = args.n, args.n_eval

    import jax
    import jax.numpy as jnp

    from vod_tpu.ops import pq as pq_ops
    from vod_tpu.ops.kmeans import _assign_chunked, kmeans
    from vod_tpu.search import SearchQueries, build_ivfpq_from_device_parts
    from vod_tpu.search.autotune import apply_runtime_params
    from vod_tpu.search.dense import PQIndex, pq_search
    from vod_tpu.search.ivfpq import assign_soar, ivfpq_search

    # ---- corpus slabs (bench_msmarco's spectrum-matched generator) ----------
    slab = -(-(-(-n // 8)) // 8192) * 8192
    n_pad = slab * 8
    spec_np = np.exp(-np.arange(D) / 35.0).astype(np.float32)
    spec = jnp.asarray(spec_np)
    basis, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(99), (D, D)))
    basis = basis.astype(jnp.float32)

    @jax.jit
    def gen_slab(key, spec, basis):
        z = jax.random.normal(key, (slab, D), dtype=jnp.float32) * spec
        x = z @ basis
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    keys = [jax.random.PRNGKey(1000 + i) for i in range(8)]
    log(f"training projections + centroids (corpus {n_pad} x {D})")
    t0 = time.time()
    train = gen_slab(keys[0], spec, basis)[:262_144]
    proj_c, _ = pq_ops.train_projection(train, 128)
    cs = train @ proj_c
    scale_c = jnp.maximum(jnp.max(jnp.abs(cs), axis=0, keepdims=True), 1e-8) / 127.0
    proj_r, _ = pq_ops.train_projection(train, 256)
    rs = train @ proj_r
    scale_r = jnp.maximum(jnp.max(jnp.abs(rs), axis=0, keepdims=True), 1e-8) / 127.0
    centroids, _ = kmeans(jax.random.PRNGKey(11), train, n_clusters=4096, n_iters=8)
    del train, cs, rs

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill(coarse, refine, key, row0, spec, basis, proj_c, scale_c, proj_r, scale_r):
        x = gen_slab(key, spec, basis)
        c = jnp.clip(jnp.round((x @ proj_c) / scale_c), -127, 127).astype(jnp.int8)
        r = jnp.clip(jnp.round((x @ proj_r) / scale_r), -127, 127).astype(jnp.int8)
        return (
            jax.lax.dynamic_update_slice(coarse, c, (row0, 0)),
            jax.lax.dynamic_update_slice(refine, r, (row0, 0)),
        )

    @jax.jit
    def assign_slab(key, spec, basis, centroids):
        x = gen_slab(key, spec, basis)
        a = _assign_chunked(x, centroids, chunk=8192)
        return a, assign_soar(x, centroids, a, chunk=4096)

    coarse = jnp.zeros((n_pad, 128), jnp.int8)
    refine = jnp.zeros((n_pad, 256), jnp.int8)
    assign_np = np.zeros((n_pad,), np.int32)
    assign2_np = np.zeros((n_pad,), np.int32)
    for i, kk in enumerate(keys):
        coarse, refine = fill(coarse, refine, kk, jnp.int32(i * slab),
                              spec, basis, proj_c, scale_c, proj_r, scale_r)
        a, a2 = assign_slab(kk, spec, basis, centroids)
        assign_np[i * slab : (i + 1) * slab] = np.asarray(a)
        assign2_np[i * slab : (i + 1) * slab] = np.asarray(a2)
    coarse.block_until_ready()
    log(f"stores + assignments built in {time.time()-t0:.0f}s")

    # ---- eval queries + exact f32 GT (slab regeneration) --------------------
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
        s = jnp.where(row < n, s, -jnp.inf)
        c_s, c_pos = jax.lax.top_k(s, K)
        all_s = jnp.concatenate([top_s, c_s], axis=-1)
        all_i = jnp.concatenate([top_i, offset + c_pos], axis=-1)
        new_s, pos = jax.lax.top_k(all_s, K)
        return new_s, jnp.take_along_axis(all_i, pos, axis=-1)

    top_s = jnp.full((n_eval, K), -jnp.inf)
    top_i = jnp.full((n_eval, K), -1, jnp.int32)
    log("exact f32 ground-truth scan")
    for i, kk in enumerate(keys):
        top_s, top_i = gt_slab(kk, top_s, top_i, jnp.int32(i * slab), jq, spec, basis)
    gt_i = np.asarray(top_i)

    def recall_of(got: np.ndarray) -> float:
        return float(np.mean(
            [len(set(got[i].tolist()) & set(gt_i[i].tolist())) / K for i in range(n_eval)]
        ))

    def make_queries(nq, seed=0):
        r = np.random.default_rng(seed)
        base = np.tile(q, (-(-nq // n_eval), 1))[:nq]
        out_q = base + 1e-3 * r.standard_normal((nq, D)).astype(np.float32)
        return out_q / np.linalg.norm(out_q, axis=1, keepdims=True)

    # ---- the two engines -----------------------------------------------------
    direct = PQIndex(
        codebooks=jnp.zeros((1, 1, 1), jnp.float32), codes=None,
        coarse_codes=coarse, coarse_scale=scale_c, proj=proj_c,
        refine_codes=refine, refine_scale=scale_r, refine_proj=proj_r,
        n_real=n, k_factor=16, approx_recall=0.95,
    )
    ivf = build_ivfpq_from_device_parts(
        centroids, jnp.zeros((1, 1, D), jnp.float32),
        np.concatenate([assign_np[:n], assign2_np[:n]]), None,
        refine_dev=jnp.concatenate([coarse[:n], coarse[:n]]),
        refine_scale=scale_c, refine_proj=proj_c,
        rerank_dev=refine[:n], rerank_scale=scale_r, rerank_proj=proj_r,
        k_factor=16, window=512, nprobe=32,
        row_ids_np=np.tile(np.arange(n, dtype=np.int32), 2), n_real=n, spilled=True,
    )
    sfn_direct = lambda ix, v: pq_search(ix, SearchQueries(vector=v), top_k=K).indices
    sfn_ivf = lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), K).indices

    results: dict = {"n": n, "points": []}
    batches = (1, 4, 8, 64)

    got = np.asarray(jax.jit(sfn_direct)(direct, jq))
    rec_direct = recall_of(got)
    point = {"engine": "serving-direct", "recall10": round(rec_direct, 4)}
    for sb in batches:
        ms = marginal_dispatch_ms(sfn_direct, direct, make_queries, sb)
        point[f"ms_b{sb}"] = round(ms, 3)
        log(f"serving-direct B={sb}: {ms:.3f} ms/dispatch (recall {rec_direct:.3f})")
    results["points"].append(point)

    best_ivf_09 = None  # (nprobe, recall, {b: ms})
    for nprobe in (16, 32, 64, 128, 256):
        ix = apply_runtime_params(ivf, {"nprobe": nprobe, "k_factor": 16})
        got = np.asarray(jax.jit(sfn_ivf)(ix, jq))
        rec = recall_of(got)
        point = {"engine": f"ivfpq-soar-np{nprobe}", "recall10": round(rec, 4)}
        for sb in batches:
            ms = marginal_dispatch_ms(sfn_ivf, ix, make_queries, sb)
            point[f"ms_b{sb}"] = round(ms, 3)
        log(f"ivfpq nprobe={nprobe}: recall {rec:.3f}, " +
            " ".join(f"B{sb}={point[f'ms_b{sb}']}ms" for sb in batches))
        results["points"].append(point)
        if rec >= 0.9 and best_ivf_09 is None:
            best_ivf_09 = point

    # ---- decision rule -------------------------------------------------------
    direct_pt = results["points"][0]
    if best_ivf_09 is None:
        results["verdict"] = (
            "no ivfpq point reaches recall@10 0.9 at any swept nprobe — "
            "ivfpq stays demoted from the per-round bench JSON"
        )
    else:
        wins = [sb for sb in batches if best_ivf_09[f"ms_b{sb}"] < direct_pt[f"ms_b{sb}"]]
        results["verdict"] = (
            f"ivfpq at {best_ivf_09['engine']} (recall {best_ivf_09['recall10']}) "
            + (f"beats serving-direct at B={wins}" if wins
               else "is slower than serving-direct at every batch size")
        )
    log(f"VERDICT: {results['verdict']}")

    # ---- end-to-end p50/p99 through SearchServer (B=1 singles) --------------
    if not args.skip_http:
        import concurrent.futures

        from vod_tpu.search.hybrid import HybridEngines
        from vod_tpu.serving import SearchHttpClient, SearchServer

        http_candidates = [("serving-direct", direct)]
        if best_ivf_09 is not None:
            np_best = int(best_ivf_09["engine"].rsplit("np", 1)[1])
            http_candidates.append(
                (best_ivf_09["engine"],
                 apply_runtime_params(ivf, {"nprobe": np_best, "k_factor": 16}))
            )
        else:  # report the highest-recall swept point for context
            http_candidates.append(
                ("ivfpq-soar-np256", apply_runtime_params(ivf, {"nprobe": 256, "k_factor": 16}))
            )
        for label, engine_ix in http_candidates:
            with SearchServer(
                HybridEngines(dense=engine_ix), batch_window_ms=0.0, max_batch=16
            ) as srv:
                srv.warmup({"vector": q[:1]}, top_k=K, batch_sizes=(1,))
                client = SearchHttpClient(srv.url)
                walls = []
                for i in range(32):
                    v = q[i % n_eval][None] + 1e-4 * np.float32(i)
                    t0 = time.time()
                    client.search(vector=v, top_k=K)
                    walls.append(time.time() - t0)
                results[f"http_{label}"] = {
                    "seq_p50_ms": round(float(np.percentile(np.asarray(walls) * 1e3, 50)), 1),
                    "seq_p99_ms": round(float(np.percentile(np.asarray(walls) * 1e3, 99)), 1),
                }
                log(f"http {label}: p50={results[f'http_{label}']['seq_p50_ms']}ms "
                    f"p99={results[f'http_{label}']['seq_p99_ms']}ms")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
