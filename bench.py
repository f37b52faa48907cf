"""Headline benchmark: dense MIPS QPS/chip + recall@10 vs CPU brute force.

The BASELINE.json north star: ">=10x faiss-CPU QPS per v5e chip at matched
recall/memory". faiss is not installed in this image, so the CPU comparator is a
torch-CPU brute-force matmul + top-k — the same kernel faiss's IndexFlatIP uses
(BLAS sgemm + heap), measured on this machine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value is
TPU QPS (1M x 768 corpus, bf16 flat index, recall@10 vs exact reported in the
metric name) and vs_baseline = tpu_qps / cpu_qps.

Timing methodology for this environment's remote-execution tunnel:
`block_until_ready` does not reliably wait and identical dispatches are
deduplicated, so (a) every dispatch gets distinct inputs, (b) completion is
forced by fetching a result slice to host, and (c) the fixed dispatch+fetch RTT
(~30 ms) is cancelled by differencing a small and a LARGE dispatch:
per-query time = (wall(BIG) - wall(SMALL)) / (BIG - SMALL). BIG must be big
enough that its compute dwarfs relay jitter (after the approx-top-k speedup a
2048-query dispatch finishes in ~RTT, which once made the difference negative),
so the big dispatch runs 16k queries as a lax.map over 2048-query blocks inside
ONE jitted call.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vod_tpu.search import SearchQueries, build_dense_index
    from vod_tpu.search.dense import dense_search

    rng = np.random.default_rng(0)
    n, d, b, k = 1_000_000, 768, 64, 10
    corpus = rng.normal(size=(n, d)).astype("float32")
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    q = corpus[rng.choice(n, b, replace=False)] + 0.1 * rng.normal(size=(b, d)).astype("float32")
    q = (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype("float32")

    # --- CPU baseline (faiss-IndexFlatIP-equivalent: BLAS matmul + topk) ---
    import torch

    _log("corpus built; running CPU baseline")
    t0 = time.time()
    scores_cpu = torch.from_numpy(q) @ torch.from_numpy(corpus).T
    exact_topk = torch.topk(scores_cpu, k, dim=-1).indices.numpy()
    cpu_s = time.time() - t0
    cpu_qps = b / cpu_s

    _log(f"CPU baseline: {cpu_qps:.1f} QPS; building TPU index")
    # --- TPU ---
    corpus_dev = jnp.asarray(corpus)
    index = build_dense_index(corpus_dev, dtype="bfloat16")
    index_fused = build_dense_index(corpus_dev, dtype="bfloat16", kernel="fused")
    del corpus, corpus_dev

    sfn = jax.jit(lambda ix, qv: dense_search(ix, SearchQueries(vector=qv), top_k=k))
    sfn_blocks = jax.jit(
        lambda ix, qblocks: jax.lax.map(
            lambda qv: (lambda r: (r.scores, r.indices))(
                dense_search(ix, SearchQueries(vector=qv), top_k=k)
            ),
            qblocks,
        )
    )

    def make_queries(n_q: int) -> jnp.ndarray:
        extra = rng.normal(size=(max(0, n_q - b), d)).astype("float32")
        out = np.concatenate([q, extra], axis=0)[:n_q]
        return jnp.asarray(out / np.linalg.norm(out, axis=-1, keepdims=True))

    def timed_small(n_q: int, reps: int = 3, *, ix) -> float:
        pools = [make_queries(n_q) + jnp.float32(1e-4 * i) for i in range(reps)]
        out = sfn(ix, pools[0])
        np.asarray(out.scores[0, 0])  # compile + settle (uploads done here too)
        walls = []
        for p in pools:
            t0 = time.time()
            out = sfn(ix, p)
            np.asarray(out.scores[-1])  # forces completion
            walls.append(time.time() - t0)
        _log(f"n_q={n_q}: walls={[round(w, 4) for w in walls]}")
        return min(walls)

    def timed_big(n_blocks: int, block: int, reps: int = 3, *, ix) -> float:
        pools = [
            jnp.stack([make_queries(block) + jnp.float32(1e-3 * (j + 7 * i)) for j in range(n_blocks)])
            for i in range(reps)
        ]
        out = sfn_blocks(ix, pools[0])
        np.asarray(out[0][0, 0, 0])  # compile + settle
        walls = []
        for p in pools:
            t0 = time.time()
            out = sfn_blocks(ix, p)
            np.asarray(out[0][-1, -1])
            walls.append(time.time() - t0)
        _log(f"n_q={n_blocks * block}: walls={[round(w, 4) for w in walls]}")
        return min(walls)

    small_q, big_blocks, block = 256, 8, 2048

    def qps_of(ix, label: str) -> float:
        _log(f"[{label}] timing small dispatch")
        w1 = timed_small(small_q, ix=ix)
        _log(f"[{label}] timing big dispatch")
        w2 = timed_big(big_blocks, block, ix=ix)
        tpu_s = (w2 - w1) / (big_blocks * block - small_q)
        assert tpu_s > 0, f"non-positive marginal ({w1=:.4f}, {w2=:.4f}); relay too noisy"
        return 1.0 / tpu_s

    def recall_of(ix) -> float:
        out = sfn(ix, make_queries(b))
        got = np.asarray(out.indices)[:b]
        return float(np.mean([len(set(got[i]) & set(exact_topk[i])) / k for i in range(b)]))

    scan_qps = qps_of(index, "scan")
    scan_recall = recall_of(index)
    try:
        fused_qps = qps_of(index_fused, "fused")
        fused_recall = recall_of(index_fused)
    except Exception as exc:  # noqa: BLE001 - report the scan path if the kernel regresses
        _log(f"fused kernel path failed ({exc}); reporting scan only")
        fused_qps, fused_recall = 0.0, 0.0
    _log(f"scan {scan_qps:,.0f} QPS @ {scan_recall:.3f}; fused {fused_qps:,.0f} QPS @ {fused_recall:.3f}")

    if fused_qps > scan_qps:
        tpu_qps, recall, path = fused_qps, fused_recall, "pallas-fused"
    else:
        tpu_qps, recall, path = scan_qps, scan_recall, "scan+approx_max_k"

    result = {
        "metric": (
            f"dense MIPS QPS/chip (1M x 768 bf16 flat, batch {block}, {path}, "
            f"recall@10={recall:.3f}; scan={scan_qps:,.0f} fused={fused_qps:,.0f})"
        ),
        "value": round(tpu_qps, 1),
        "unit": "QPS",
        "vs_baseline": round(tpu_qps / cpu_qps, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
