"""Fused-MIPS kernel shootout on the real TPU (VERDICT round-1 weak #8).

Compares, at the headline shape (1M x 768 bf16, B=2048 blocks, k=10):
  A. lax.scan chunks + hardware `approx_max_k` (`search/dense.py::_scan_topk`)
     — materializes [B, chunk] score blocks in HBM,
  B. `fused_mips_binned` — Pallas matmul + binned streaming max (scores never
     leave VMEM),
  C. `fused_mips_topk` — the exact Pallas kernel.

Measured 2026-08-17 on v5e-1 (this script): A 108,969 QPS @ recall@10 0.9984;
B 118,429 QPS @ 0.9848 (tile=1024, qblock=2048, bins=512) — the fused kernel
beats the scan by ~9%; C (exact) 10,842 QPS @ 1.0000. B's recall matches its
analytic bound 1 - (k-1)/(2*bins) = 0.991 up to sampling noise.

Methodology (verify skill + hard-won corrections):
  * the corpus/index is ALWAYS a jit argument (closing over a 1.5GB array
    hangs the remote-compile relay);
  * query pools are PRE-STAGED on device before timing — jnp.asarray uploads
    ~3MB/call over the tunnel, which once polluted per-call timings by 5-10x;
  * both paths run `lax.map` over 2048-query blocks inside ONE dispatch; the
    per-query marginal is (wall(8 blocks) - wall(1 block)) / (7 * 2048), which
    cancels the fixed ~30ms dispatch RTT; min over 3 repetitions;
  * ground truth = exact top-k over the SAME bf16 corpus computed on-device
    (a host matmul takes minutes on this 1-core box).

Usage: python examples/mips_kernel_bench.py [--n 1048576] [--d 768] [--blk 2048]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main() -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--blk", type=int, default=2048)
    ap.add_argument("--nblocks", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--skip-exact-kernel", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vod_tpu.ops.mips_pallas import fused_mips_binned, fused_mips_topk
    from vod_tpu.search import SearchQueries, build_dense_index
    from vod_tpu.search.dense import dense_search

    n, d, blk, nb, k = args.n, args.d, args.blk, args.nblocks, args.k
    rng = np.random.default_rng(0)
    print(f"# corpus {n} x {d} bf16, {nb} blocks x {blk} queries, k={k}", flush=True)
    corpus_np = rng.standard_normal(size=(n, d), dtype=np.float32)
    corpus_np /= np.linalg.norm(corpus_np, axis=-1, keepdims=True)
    corpus = jnp.asarray(corpus_np, dtype=jnp.bfloat16)
    print("# corpus staged", flush=True)

    def qblocks(seed: int, nblocks: int) -> jnp.ndarray:
        r = np.random.default_rng(seed)
        q = corpus_np[r.integers(0, n, size=nblocks * blk)]
        q = q + 0.05 * r.standard_normal((nblocks * blk, d), dtype=np.float32)
        q = (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)
        return jnp.asarray(q.reshape(nblocks, blk, d), dtype=jnp.bfloat16)

    REPS = 3
    pools_small = [qblocks(10 + i, 1) for i in range(REPS)]
    pools_big = [qblocks(50 + i, nb) for i in range(REPS)]
    warm_small, warm_big = qblocks(98, 1), qblocks(99, nb)
    for p in pools_small + pools_big + [warm_small, warm_big]:
        np.asarray(p[0, 0, 0])  # force upload completion
    print("# query pools staged on device", flush=True)

    seed_ctr = [5000]

    def measure(map_fn, arg, name: str) -> float:
        np.asarray(map_fn(arg, warm_small)[0, :, -1])
        np.asarray(map_fn(arg, warm_big)[0, :, -1])
        best = 0.0
        for i in range(REPS):
            t = time.time(); np.asarray(map_fn(arg, pools_small[i])[-1, :, -1]); w1 = time.time() - t
            t = time.time(); np.asarray(map_fn(arg, pools_big[i])[-1, :, -1]); w2 = time.time() - t
            per_q = (w2 - w1) / ((nb - 1) * blk)
            qps = 1.0 / per_q if per_q > 0 else 0.0
            best = max(best, qps)
        print(f"# {name}: {best:,.0f} QPS", flush=True)
        return best

    # ground truth (exact, on-device, same bf16 corpus) for recall
    exact_index = build_dense_index(corpus, dtype="bfloat16", approx_recall=None)
    exact_fn = jax.jit(
        lambda ix, qq: dense_search(ix, SearchQueries(vector=qq), top_k=k).indices
    )
    q_eval = qblocks(99, 1)[0][:256]
    gt = np.asarray(exact_fn(exact_index, jnp.pad(q_eval, ((0, blk - 256), (0, 0)))))[:256]
    print("# exact ground truth ready", flush=True)

    def recall(ids_fn, arg) -> float:
        ids = np.asarray(ids_fn(arg, jnp.pad(q_eval, ((0, blk - 256), (0, 0)))))[:256]
        return float(np.mean([len(set(ids[i]) & set(gt[i])) / k for i in range(len(gt))]))

    results: dict = {"n": n, "d": d, "blk": blk, "nblocks": nb, "k": k}

    index = build_dense_index(corpus, dtype="bfloat16")  # approx_recall=0.95 scan
    scan_one = jax.jit(lambda ix, qq: dense_search(ix, SearchQueries(vector=qq), top_k=k).indices)
    scan_map = jax.jit(lambda ix, qb: jax.lax.map(
        lambda qq: dense_search(ix, SearchQueries(vector=qq), top_k=k).indices, qb))
    results["scan_qps"] = measure(scan_map, index, "A scan+approx_max_k")
    results["scan_recall"] = recall(scan_one, index)

    pad = (-n) % 1024
    vpad = jnp.pad(corpus, ((0, pad), (0, 0))) if pad else corpus
    bin_one = jax.jit(lambda vv, qq: fused_mips_binned(vv, qq, k=k, n_real=n)[1])
    bin_map = jax.jit(lambda vv, qb: jax.lax.map(
        lambda qq: fused_mips_binned(vv, qq, k=k, n_real=n)[1], qb))
    results["binned_qps"] = measure(bin_map, vpad, "B pallas binned")
    results["binned_recall"] = recall(bin_one, vpad)

    if not args.skip_exact_kernel:
        pad2 = (-n) % 2048
        vpad2 = jnp.pad(corpus, ((0, pad2), (0, 0))) if pad2 else corpus
        ex_one = jax.jit(lambda vv, qq: fused_mips_topk(vv, qq, k=k, qblock=256, n_real=n)[1])
        ex_map = jax.jit(lambda vv, qb: jax.lax.map(
            lambda qq: fused_mips_topk(vv, qq, k=k, qblock=256, n_real=n)[1], qb))
        results["exact_kernel_qps"] = measure(ex_map, vpad2, "C pallas exact")
        results["exact_kernel_recall"] = recall(ex_one, vpad2)

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
