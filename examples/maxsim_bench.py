"""Late-interaction (MaxSim) two-stage serving benchmark at 1M docs.

Store: 1M docs x 32 tokens x 128-d int8 token embeddings (4 GB HBM) + a
pooled int8 first-stage index. Query: B=64, Lq=8. Measures:
  * recall@10 of (pooled -> MaxSim rerank) vs brute-force MaxSim ground truth
  * recall@10 of pooled-only (what single-vector scoring gets)
  * marginal latency of the two-stage search per 64-query block

Token model mirrors the multi-topic structure real passages have: each doc
draws its tokens from a few topic directions + noise; queries target a subset
of one doc's topics, so pooled means blur exactly what MaxSim preserves.

Run (real TPU): python examples/maxsim_bench.py [--n 1000000]
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--lt", type=int, default=32)
    ap.add_argument("--lq", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-candidates", type=int, default=256)
    ap.add_argument("--n-topics", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vod_tpu.search import (
        SearchQueries,
        build_dense_index,
        build_maxsim_index,
        maxsim_search,
    )
    from vod_tpu.search.dense import dense_search
    from vod_tpu.search.maxsim import maxsim_rerank

    n, lt, lq, d, b, k = args.n, args.lt, args.lq, args.d, args.b, args.k
    slab = 65_536
    n_pad = -(-n // slab) * slab

    topics = jax.random.normal(jax.random.PRNGKey(1), (args.n_topics, d), jnp.float32)
    topics = topics / jnp.linalg.norm(topics, axis=-1, keepdims=True)

    # NOTE (remote-relay): big arrays ride as jit ARGUMENTS — closures embed
    # as program literals, shipped at ~100 s/MB per compile (bench.py).
    @jax.jit
    def gen_slab(key, topics):
        """[slab, Lt, D] unit token vectors: per-doc 4 topics + noise."""
        kt, kn, ka = jax.random.split(key, 3)
        doc_topics = jax.random.randint(kt, (slab, 4), 0, args.n_topics)
        tok_topic = doc_topics[:, jax.random.randint(ka, (lt,), 0, 4)]  # [slab, Lt]
        base = topics[tok_topic]  # [slab, Lt, D]
        x = base + 0.25 * jax.random.normal(kn, (slab, lt, d), jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    # int8 token store + pooled vectors, assembled slab-wise on device
    scale_val = 1.2 / 127.0  # unit-norm tokens: |coord| <~ 1.2 after noise
    scale = jnp.full((1, d), scale_val, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill(codes, pooled, key, row0, topics):
        x = gen_slab(key, topics)
        q8 = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        p = x.mean(axis=1)
        p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-9)
        return (
            jax.lax.dynamic_update_slice(codes, q8, (row0, 0, 0)),
            jax.lax.dynamic_update_slice(pooled, p, (row0, 0)),
        )

    print(f"# building {n_pad} x {lt} x {d} int8 token store on device", file=sys.stderr)
    keys = [jax.random.PRNGKey(100 + i) for i in range(n_pad // slab)]
    codes = jnp.zeros((n_pad, lt, d), jnp.int8)
    pooled = jnp.zeros((n_pad, d), jnp.float32)
    for i, kk in enumerate(keys):
        codes, pooled = fill(codes, pooled, kk, jnp.int32(i * slab), topics)
    codes.block_until_ready()

    from vod_tpu.search.maxsim import MaxSimIndex

    ms_idx = MaxSimIndex(
        token_codes=codes, token_mask=jnp.ones((n_pad, lt), bool), scale=scale,
        n_real=n,
    )
    pooled_idx = build_dense_index(pooled, dtype="int8")
    del codes, pooled

    # queries: 2 topics of a random doc (regenerate its slab to find them)
    rng = np.random.default_rng(0)
    gold_rows = rng.integers(0, min(n, slab), b)  # rows of slab 0
    s0 = np.asarray(gen_slab(keys[0], topics)[jnp.asarray(gold_rows)])  # [B, Lt, D]
    sel = rng.integers(0, lt, (b, lq))
    q_tok = np.stack([s0[i, sel[i]] for i in range(b)])  # [B, Lq, D]
    q_tok += 0.1 * rng.standard_normal((b, lq, d)).astype(np.float32)
    q_tok /= np.linalg.norm(q_tok, axis=-1, keepdims=True)
    jq_tok = jnp.asarray(q_tok)
    q_pool = q_tok.mean(axis=1)
    q_pool /= np.linalg.norm(q_pool, axis=-1, keepdims=True)
    jq_pool = jnp.asarray(q_pool)
    qm = jnp.ones((b, lq), bool)

    # brute-force MaxSim ground truth: chunked full-corpus rerank
    chunk = 8192
    ids_all = jnp.arange(n_pad, dtype=jnp.int32)

    @jax.jit
    def gt_chunk(top_s, top_i, start):
        cand = jax.lax.dynamic_slice(ids_all, (start,), (chunk,))
        cand = jnp.where(cand < n, cand, -1)
        s = maxsim_rerank(ms_idx, jq_tok, qm, jnp.tile(cand[None], (b, 1)))
        all_s = jnp.concatenate([top_s, s], axis=-1)
        all_i = jnp.concatenate([top_i, jnp.tile(cand[None], (b, 1))], axis=-1)
        ns, pos = jax.lax.top_k(all_s, k)
        return ns, jnp.take_along_axis(all_i, pos, axis=-1)

    print("# brute-force MaxSim ground truth scan", file=sys.stderr)
    t0 = time.time()
    top_s = jnp.full((b, k), -jnp.inf)
    top_i = jnp.full((b, k), -1, jnp.int32)
    for start in range(0, n_pad, chunk):
        top_s, top_i = gt_chunk(top_s, top_i, jnp.int32(start))
    gt = np.asarray(top_i)
    gt_s = time.time() - t0
    print(f"# GT scan {gt_s:.0f}s", file=sys.stderr)

    first = lambda qq, kk_: dense_search(pooled_idx, qq, kk_)
    two_stage = jax.jit(
        lambda qp, qt: maxsim_search(
            first, ms_idx, SearchQueries(vector=qp), qt, qm, k,
            n_candidates=args.n_candidates,
        ).indices
    )
    got = np.asarray(two_stage(jq_pool, jq_tok))
    recall = float(np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(b)]))
    pooled_only = np.asarray(first(SearchQueries(vector=jq_pool), k).indices)
    recall_pooled = float(np.mean([len(set(pooled_only[i]) & set(gt[i])) / k for i in range(b)]))

    # marginal latency: 9-block vs 1-block lax.map walls (RTT cancels)
    def mk(seed):
        r = np.random.default_rng(seed)
        qt = q_tok + 1e-3 * r.standard_normal(q_tok.shape).astype(np.float32)
        qt /= np.linalg.norm(qt, axis=-1, keepdims=True)
        qp = qt.mean(axis=1); qp /= np.linalg.norm(qp, axis=-1, keepdims=True)
        return jnp.asarray(qp), jnp.asarray(qt)

    blocked = jax.jit(
        lambda qps, qts: jax.lax.map(
            lambda a: maxsim_search(
                first, ms_idx, SearchQueries(vector=a[0]), a[1], qm, k,
                n_candidates=args.n_candidates,
            ).indices,
            (qps, qts),
        )
    )
    ones = [tuple(jnp.asarray(x[None]) for x in mk(i)) for i in range(3)]
    nines = []
    for i in range(3):
        ps, ts = zip(*(mk(100 + 9 * i + j) for j in range(9)))
        nines.append((jnp.stack(ps), jnp.stack(ts)))
    np.asarray(blocked(*ones[0])[0, 0, 0]); np.asarray(blocked(*nines[0])[0, 0, 0])
    w1 = w9 = float("inf")
    for i in range(3):
        t = time.time(); np.asarray(blocked(*ones[i])[-1, -1]); w1 = min(w1, time.time() - t)
        t = time.time(); np.asarray(blocked(*nines[i])[-1, -1]); w9 = min(w9, time.time() - t)
    ms_block = max((w9 - w1) / 8 * 1000, 1e-6)
    gb = n_pad * lt * d / 2**30

    print(json.dumps({
        "metric": (
            f"1M-doc MaxSim two-stage serving ({lt} tok x {d}d int8 store {gb:.1f} GB, "
            f"C={args.n_candidates}): recall@10={recall:.3f} vs brute-force MaxSim "
            f"(pooled-only {recall_pooled:.3f}); {ms_block:.2f} ms per {b}-query block"
        ),
        "value": round(b / (ms_block / 1000), 1),
        "unit": "serving QPS (B=64)",
        "vs_baseline": round(recall, 4),
    }))


if __name__ == "__main__":
    main()
