"""PQ codec ladder on saved real embeddings: recall@10 + honest QPS.

Reuses the embeddings saved by `real_embedding_eval.py --out` so codec
experiments skip harvest/train/embed (~10 min). Timing follows the verified
recipe: pre-stage query pools on device, warm EVERY shape before timing,
difference two batch sizes, min over reps.

Usage: python examples/pq_codec_sweep.py [--emb /tmp/real_emb_200k.npy]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--emb", default="/tmp/real_emb_200k.npy")
    ap.add_argument("--queries", default=None, help="default: <emb>_queries.npy")
    ap.add_argument("--q", type=int, default=2048)
    ap.add_argument("--configs", default=None, help="comma list to filter by name substring")
    ap.add_argument(
        "--aniso", action="store_true",
        help="train the PQ entries with the anisotropic (ScaNN) objective too "
        "and report both codecs side by side",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vod_tpu.search import SearchQueries, build_dense_index, build_pq_index
    from vod_tpu.search.dense import dense_search, pq_search

    emb = np.load(args.emb).astype(np.float32)
    qpath = args.queries or args.emb.replace(".npy", "_queries.npy")
    q_emb = np.load(qpath).astype(np.float32)[: args.q]
    n, dim = emb.shape
    b = q_emb.shape[0]
    print(f"# corpus {n} x {dim}, {b} queries", flush=True)

    flat_exact = build_dense_index(jnp.asarray(emb), dtype="float32", approx_recall=None)
    gt = dense_search(flat_exact, SearchQueries(vector=jnp.asarray(q_emb)), top_k=10)
    gt_i = np.asarray(gt.indices)
    del flat_exact

    # pre-staged distinct query pools (dedup-proof timing over the relay)
    rng = np.random.default_rng(0)
    q1 = jnp.asarray(q_emb + 1e-4 * rng.standard_normal(q_emb.shape).astype(np.float32))
    q2 = jnp.asarray(
        np.tile(q_emb, (2, 1)) + 1e-4 * rng.standard_normal((2 * b, dim)).astype(np.float32)
    )

    def measure(index, search_fn, name, bytes_pv):
        out = search_fn(index, SearchQueries(vector=jnp.asarray(q_emb)), top_k=10)
        got = np.asarray(out.indices)
        rec = float(np.mean([len(set(got[i].tolist()) & set(gt_i[i].tolist())) / 10 for i in range(b)]))
        f = jax.jit(lambda idx, v: search_fn(idx, SearchQueries(vector=v), top_k=10).indices)
        _ = np.asarray(f(index, q1))  # warm shape b
        _ = np.asarray(f(index, q2))  # warm shape 2b
        d1 = d2 = float("inf")
        for _rep in range(3):
            t = time.time(); _ = np.asarray(f(index, q1)); d1 = min(d1, time.time() - t)
            t = time.time(); _ = np.asarray(f(index, q2)); d2 = min(d2, time.time() - t)
        qps = b / max(d2 - d1, 1e-9)
        print(f"# {name:30s} {bytes_pv:4d}B/vec recall@10 {rec:.4f}  ~{qps:,.0f} QPS", flush=True)
        return {"name": name, "bytes_per_vec": bytes_pv, "recall10": round(rec, 4), "qps": round(qps)}

    results = []
    ladder = [
        ("int8-flat", "int8", dict(), dim),
        ("pq64x8-exh", "pq", dict(n_subquantizers=64, coarse_dim=None), 64),
        ("pq32x8-exh+ref8", "pq",
         dict(n_subquantizers=32, coarse_dim=None, refine="int8", k_factor=8), 32 + dim),
        ("pq32x8-exh+ref32", "pq",
         dict(n_subquantizers=32, coarse_dim=None, refine="int8", k_factor=32), 32 + dim),
        ("pq64x8-exh+ref16", "pq",
         dict(n_subquantizers=64, coarse_dim=None, refine="int8", k_factor=16), 64 + dim),
        ("pq64x8-exh+ref32", "pq",
         dict(n_subquantizers=64, coarse_dim=None, refine="int8", k_factor=32), 64 + dim),
        ("pq32+coarse64+ref32", "pq",
         dict(n_subquantizers=32, coarse_dim=64, n_candidates=4096, refine="int8", k_factor=32),
         32 + 64 + dim),
        # truncated-PCA refine: the memory frontier between codes-only and int8
        ("pq64-exh+ref32-d64", "pq",
         dict(n_subquantizers=64, coarse_dim=None, refine="int8", refine_dim=64, k_factor=32),
         64 + 64),
        ("pq64-exh+ref32-d128", "pq",
         dict(n_subquantizers=64, coarse_dim=None, refine="int8", refine_dim=128, k_factor=32),
         64 + 128),
        ("pq32-exh+ref32-d128", "pq",
         dict(n_subquantizers=32, coarse_dim=None, refine="int8", refine_dim=128, k_factor=32),
         32 + 128),
    ]
    for name, kind, kw, bytes_pv in ladder:
        if args.configs and not any(c in name for c in args.configs.split(",")):
            continue
        variants = [("", None)]
        if kind == "pq" and args.aniso:
            variants.append(("+aniso", "auto"))
        for suffix, aniso_eta in variants:
            t0 = time.time()
            if kind == "int8":
                idx = build_dense_index(jnp.asarray(emb), dtype="int8")
                fn = dense_search
            else:
                idx = build_pq_index(
                    jax.random.PRNGKey(0), jnp.asarray(emb),
                    train_size=min(200_000, n), kmeans_iters=8,
                    aniso_eta=aniso_eta, **kw,
                )
                fn = pq_search
            build_s = time.time() - t0
            r = measure(idx, fn, name + suffix, bytes_pv)
            r["build_s"] = round(build_s, 1)
            results.append(r)
            del idx

    print(json.dumps(results))


if __name__ == "__main__":
    main()
