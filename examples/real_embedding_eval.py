"""Real-embedding PQ evaluation (BASELINE configs #2/#4 shape, offline).

Round-1's PQ numbers were measured on i.i.d. gaussians — the provable worst
case for any coarse-projection compressor (isotropic spectrum). This script
closes that gap with REAL embeddings end to end:

  1. harvest real text passages from the local filesystem (Zipfian statistics),
  2. train the in-repo dual encoder contrastively for a few hundred steps
     (query = word window of its passage, in-batch negatives),
  3. embed the full corpus (the framework's chunked predict path),
  4. report the embedding spectrum (top-k variance shares),
  5. build flat / int8 / PQ(+OPQ) indexes and measure recall@10 vs the exact
     flat ground truth + QPS on held-out query windows.

Usage: python examples/real_embedding_eval.py [--n 200000] [--steps 300]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main() -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000, help="corpus passages")
    ap.add_argument("--steps", type=int, default=300, help="contrastive train steps")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--q", type=int, default=4096, help="eval queries")
    ap.add_argument("--dim", type=int, default=384, help="embedding dim (e5-small shape)")
    ap.add_argument("--max_len", type=int, default=48)
    ap.add_argument("--n_candidates", type=int, default=4096, help="PQ rescore pool")
    ap.add_argument("--out", type=str, default=None, help="save embeddings .npy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vod_tpu.data.loaders.local_text import (
        build_word_vocab,
        encode_passages,
        harvest_text_passages,
    )
    from vod_tpu.models import Ranker, RetrievalGradients, TransformerEncoderConfig, VodPoolerConfig
    from vod_tpu.search import SearchQueries, build_dense_index, build_pq_index
    from vod_tpu.search.dense import dense_search, pq_search

    t0 = time.time()
    print(f"# harvesting {args.n} real passages from site-packages ...", flush=True)
    passages = harvest_text_passages(args.n, passage_words=args.max_len)
    print(f"# got {len(passages)} passages in {time.time()-t0:.0f}s", flush=True)
    vocab = build_word_vocab(passages, vocab_size=32768)
    ids_np, mask_np = encode_passages(passages, vocab, max_length=args.max_len)

    cfg = TransformerEncoderConfig(
        vocab_size=32768, hidden_size=256, num_layers=4, num_heads=4,
        intermediate_size=512, max_position_embeddings=args.max_len,
        pooler=VodPoolerConfig(
            agg_method="mean", projection_size=args.dim, output_norm="l2",
            scaler=10.0, learn_scaler=True,
        ),
    )
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())
    rng = np.random.default_rng(0)

    # --- contrastive training: query window vs in-batch passages -------------
    def make_pair_batch(seed: int, b: int):
        r = np.random.default_rng(seed)
        rows = r.integers(0, len(passages), size=b)
        sec_ids, sec_mask = ids_np[rows], mask_np[rows]
        q_ids = np.zeros((b, 16), np.int32)
        q_mask = np.zeros((b, 16), np.int32)
        for i, row in enumerate(rows):
            L = int(mask_np[row].sum())
            w = min(16, max(4, L // 3))
            s0 = int(r.integers(0, max(1, L - w)))
            q_ids[i, :w] = ids_np[row, s0 : s0 + w]
            q_mask[i, :w] = 1
        return jnp.asarray(q_ids), jnp.asarray(q_mask), jnp.asarray(sec_ids), jnp.asarray(sec_mask)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids_np[:2]), jnp.asarray(mask_np[:2]),
        method=Ranker.encode_field,
    )
    tx = optax.adamw(3e-4, weight_decay=0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, qi, qm, si, sm):
        def loss_fn(p):
            qe = model.apply(p, qi, qm, method=Ranker.encode_field)
            se = model.apply(p, si, sm, method=Ranker.encode_field)
            logits = qe @ se.T  # in-batch negatives
            labels = jnp.arange(qi.shape[0])
            return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    print(f"# training encoder: {args.steps} steps x batch {args.batch}", flush=True)
    t0 = time.time()
    for s in range(args.steps):
        qi, qm, si, sm = make_pair_batch(1000 + s, args.batch)
        params, opt_state, loss = step(params, opt_state, qi, qm, si, sm)
        if s % 50 == 0 or s == args.steps - 1:
            print(f"#   step {s}: loss {float(loss):.4f}", flush=True)
    train_s = time.time() - t0

    # --- embed the corpus (chunked jit forward) ------------------------------
    print("# embedding corpus", flush=True)
    t0 = time.time()
    embed = jax.jit(lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field))
    chunks = []
    B = 4096
    for s0 in range(0, len(passages), B):
        e = embed(params, jnp.asarray(ids_np[s0 : s0 + B]), jnp.asarray(mask_np[s0 : s0 + B]))
        chunks.append(np.asarray(e, dtype=np.float32))
    emb = np.concatenate(chunks)
    embed_s = time.time() - t0
    if args.out:
        np.save(args.out, emb)

    # --- spectrum ------------------------------------------------------------
    sample = emb[rng.choice(len(emb), size=min(50_000, len(emb)), replace=False)]
    cov = np.cov(sample.T)
    eig = np.sort(np.linalg.eigvalsh(cov))[::-1]
    shares = np.cumsum(eig) / eig.sum()
    spectrum = {f"top{k}_variance_share": round(float(shares[k - 1]), 4) for k in (16, 32, 64, 128)}
    print(f"# spectrum: {spectrum}", flush=True)

    # --- queries + ground truth ----------------------------------------------
    qrows = rng.choice(len(passages), size=args.q, replace=False)
    q_ids = np.zeros((args.q, 16), np.int32)
    q_mask = np.zeros((args.q, 16), np.int32)
    for i, row in enumerate(qrows):
        L = int(mask_np[row].sum())
        w = min(16, max(4, L // 3))
        s0 = int(rng.integers(0, max(1, L - w)))
        q_ids[i, :w] = ids_np[row, s0 : s0 + w]
        q_mask[i, :w] = 1
    q_emb = np.asarray(embed(params, jnp.asarray(q_ids), jnp.asarray(q_mask)), dtype=np.float32)
    if args.out:  # query side saved alongside so codec sweeps can skip retraining
        np.save(args.out.replace(".npy", "_queries.npy"), q_emb)

    import jax.numpy as jnp  # noqa: F811

    flat_exact = build_dense_index(jnp.asarray(emb), dtype="float32", approx_recall=None)
    gt = dense_search(flat_exact, SearchQueries(vector=jnp.asarray(q_emb)), top_k=10)
    gt_i = np.asarray(gt.indices)
    # retrieval quality sanity: does the trained encoder retrieve the source passage?
    self_hit = float(np.mean([qrows[i] in set(gt_i[i].tolist()) for i in range(args.q)]))
    print(f"# encoder self-retrieval hit@10 (exact): {self_hit:.3f}", flush=True)

    def recall_and_qps(index, search_fn, name):
        out = search_fn(index, SearchQueries(vector=jnp.asarray(q_emb)), top_k=10)
        got = np.asarray(out.indices)
        rec = float(np.mean([
            len(set(got[i].tolist()) & set(gt_i[i].tolist())) / 10 for i in range(args.q)
        ]))
        # QPS: two batch sizes, difference cancels dispatch overhead
        jq = jnp.asarray(np.tile(q_emb, (2, 1))[: 2 * args.q])
        f = jax.jit(lambda v: search_fn(index, SearchQueries(vector=v), top_k=10).indices)
        _ = np.asarray(f(jq[: args.q]))  # warm
        t1 = time.time(); _ = np.asarray(f(jq[: args.q])); d1 = time.time() - t1
        t2 = time.time(); _ = np.asarray(f(jq)); d2 = time.time() - t2
        qps = args.q / max(d2 - d1, 1e-9)
        print(f"# {name}: recall@10 {rec:.4f}, ~{qps:,.0f} QPS", flush=True)
        return rec, qps

    results = {"n": len(passages), "dim": args.dim, "self_hit10": self_hit,
               "train_s": round(train_s, 1), "embed_s": round(embed_s, 1), **spectrum}

    bf16 = build_dense_index(jnp.asarray(emb), dtype="bfloat16")
    results["bf16_recall10"], results["bf16_qps"] = recall_and_qps(bf16, dense_search, "flat bf16")
    int8 = build_dense_index(jnp.asarray(emb), dtype="int8")
    results["int8_recall10"], results["int8_qps"] = recall_and_qps(int8, dense_search, "int8")

    t0 = time.time()
    pq = build_pq_index(
        jax.random.PRNGKey(0), jnp.asarray(emb),
        n_subquantizers=32, coarse_dim=64, n_candidates=args.n_candidates,
        train_size=min(200_000, len(emb)), kmeans_iters=8, use_opq=True, opq_iters=3,
    )
    results["pq_build_s"] = round(time.time() - t0, 1)
    results["pq_recall10"], results["pq_qps"] = recall_and_qps(pq, pq_search, "pq32+opq (coarse64)")
    results["pq_bytes_per_vec"] = 32 + 64  # codes + int8 coarse

    # --- round-3 codec ladder: exhaustive ADC + exact re-rank ----------------
    # bytes/vec = M (codes) [+ coarse_dim] [+ dim for int8 refine]
    train_n = min(200_000, len(emb))
    for name, kw, bytes_pv in [
        ("pq32x8-exh", dict(n_subquantizers=32, coarse_dim=None), 32),
        ("pq64x8-exh", dict(n_subquantizers=64, coarse_dim=None), 64),
        ("pq64x8-exh+opq", dict(n_subquantizers=64, coarse_dim=None, use_opq=True, opq_iters=3), 64),
        ("pq32x8-exh+ref8", dict(n_subquantizers=32, coarse_dim=None, refine="int8", k_factor=8),
         32 + args.dim),
        ("pq64x8-exh+ref8", dict(n_subquantizers=64, coarse_dim=None, refine="int8", k_factor=8),
         64 + args.dim),
        ("pq32+coarse64+ref8", dict(n_subquantizers=32, coarse_dim=64,
                                    n_candidates=args.n_candidates, refine="int8", k_factor=8),
         32 + 64 + args.dim),
        # 4-bit fast-scan (faiss PQ{M}x4fs parity): equal code bytes, 16x
        # smaller one-hot decode temps -> much faster exhaustive scan
        ("pq64x4fs-exh+ref8", dict(n_subquantizers=64, code_bits=4, coarse_dim=None,
                                   refine="int8", k_factor=8), 32 + args.dim),
        ("pq128x4fs-exh+ref8", dict(n_subquantizers=128, code_bits=4, coarse_dim=None,
                                    refine="int8", k_factor=8), 64 + args.dim),
        ("pq128x4fs-exh+pca128ref16", dict(n_subquantizers=128, code_bits=4, coarse_dim=None,
                                           refine="int8", refine_dim=128, k_factor=16),
         64 + 128),
    ]:
        t0 = time.time()
        idx = build_pq_index(
            jax.random.PRNGKey(0), jnp.asarray(emb),
            train_size=train_n, kmeans_iters=8, **kw,
        )
        build_s = round(time.time() - t0, 1)
        rec, qps = recall_and_qps(idx, pq_search, f"{name} ({bytes_pv}B/vec, build {build_s}s)")
        key = name.replace("+", "_").replace("-", "_")
        results[f"{key}_recall10"], results[f"{key}_qps"] = rec, qps
        results[f"{key}_bytes_per_vec"] = bytes_pv
        del idx

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
