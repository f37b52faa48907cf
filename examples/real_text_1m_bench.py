"""Real-text retrieval at >=1M sections: the VERDICT r3 #3 closure.

All prior 8.8M numbers were synthetic/spectrum-matched; real-embedding
evidence stopped at 200k rows. This runs the full pipeline on 1,048,576 REAL
text passages (zero-egress local corpus: package docs/docstrings/READMEs —
natural Zipfian statistics; overlapping 48-word windows, stride 32, the same
overlap semantics as `data/sectioning.py`):

  1. harvest + word-encode the corpus,
  2. contrastively train the in-repo dual encoder (query window vs in-batch
     passages), embed all 1M+ with the chunked forward,
  3. exact-f32 ground truth on device, then recall@10 + block QPS + B=64
     serving QPS for int8 / pq4fs+refine / serving-direct —
     every index built through `DenseFactoryConfig` (the config surface users
     hit),
  4. stemmed vs unstemmed BM25 gold-hit@10 through the native analyzer at the
     full 1M (VERDICT r3 #5's real-text quality proof).

Reference regime this stands in for: MSMARCO passage retrieval
(`/root/reference/src/vod_exps/hydra/datasets/msmarco.yaml`).

Embeddings are cached in /tmp keyed by (n, dim, steps) so bench.py reruns
skip train+embed. Usage (real TPU):
  python examples/real_text_1m_bench.py [--n 1048576] [--steps 300]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 10
HARVEST_KW = dict(passage_words=48, stride=32, max_bytes_per_file=4 << 20)


def log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def harvest(n: int) -> list[dict]:
    from vod_tpu.data.loaders.local_text import harvest_text_passages

    t0 = time.time()
    passages = harvest_text_passages(n, **HARVEST_KW)
    log(f"harvested {len(passages)} passages in {time.time()-t0:.0f}s")
    return passages


def query_windows(passages, rng, n_q: int, width: int = 16):
    """Held-out word windows: (rows, texts). Texts feed BM25; the encoded ids
    feed the dense side — one query set for both."""
    rows = rng.choice(len(passages), size=n_q, replace=False)
    texts = []
    for r in rows:
        words = passages[r]["content"].split()
        w = min(width, max(4, len(words) // 3))
        s0 = int(rng.integers(0, max(1, len(words) - w)))
        texts.append(" ".join(words[s0 : s0 + w]))
    return rows, texts


def train_and_embed(passages, args, cache: pathlib.Path):
    """Contrastive train + chunked embed; cached npz keyed by config."""
    import jax
    import jax.numpy as jnp
    import optax

    from vod_tpu.data.loaders.local_text import build_word_vocab, encode_passages
    from vod_tpu.models import (
        Ranker,
        RetrievalGradients,
        TransformerEncoderConfig,
        VodPoolerConfig,
    )

    rng = np.random.default_rng(0)
    qrows, qtexts = query_windows(passages, rng, args.q)
    if cache.exists():
        z = np.load(cache)
        if z["emb"].shape == (len(passages), args.dim):
            log(f"embeddings loaded from {cache}")
            return z["emb"], z["q_emb"], qrows, qtexts
        log("cache shape mismatch; recomputing")

    vocab = build_word_vocab(passages[:300_000], vocab_size=32768)
    t0 = time.time()
    ids_np, mask_np = encode_passages(passages, vocab, max_length=48)
    log(f"encoded {len(passages)} passages in {time.time()-t0:.0f}s")

    cfg = TransformerEncoderConfig(
        vocab_size=32768, hidden_size=256, num_layers=4, num_heads=4,
        intermediate_size=512, max_position_embeddings=48,
        pooler=VodPoolerConfig(
            agg_method="mean", projection_size=args.dim, output_norm="l2",
            scaler=10.0, learn_scaler=True,
        ),
    )
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())

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
            logits = qe @ se.T
            labels = jnp.arange(qi.shape[0])
            return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    log(f"training encoder: {args.steps} steps x batch {args.batch}")
    t0 = time.time()
    for s in range(args.steps):
        qi, qm, si, sm = make_pair_batch(1000 + s, args.batch)
        params, opt_state, loss = step(params, opt_state, qi, qm, si, sm)
        if s % 100 == 0 or s == args.steps - 1:
            log(f"  step {s}: loss {float(loss):.4f}")
    log(f"trained in {time.time()-t0:.0f}s")

    embed = jax.jit(lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field))
    t0 = time.time()
    chunks, B = [], 8192
    for s0 in range(0, len(passages), B):
        e = embed(params, jnp.asarray(ids_np[s0 : s0 + B]), jnp.asarray(mask_np[s0 : s0 + B]))
        chunks.append(np.asarray(e, dtype=np.float32))
    emb = np.concatenate(chunks)
    log(f"embedded {emb.shape} in {time.time()-t0:.0f}s")

    # query windows through the SAME vocab/encoder
    q_ids = np.zeros((args.q, 16), np.int32)
    q_mask = np.zeros((args.q, 16), np.int32)
    for i, text in enumerate(qtexts):
        toks = [vocab.get(w.lower(), 1) for w in text.split()][:16]
        q_ids[i, : len(toks)] = toks
        q_mask[i, : len(toks)] = 1
    q_emb = np.asarray(embed(params, jnp.asarray(q_ids), jnp.asarray(q_mask)), dtype=np.float32)
    np.savez(cache, emb=emb, q_emb=q_emb)
    log(f"cached embeddings -> {cache}")
    return emb, q_emb, qrows, qtexts


def serve_ms_block(sfn, index, q_src, d, sb=64, reps=4, b_small=4, b_big=68):
    """Marginal B=64 serving-block wall: difference a `b_big`-block and a
    `b_small`-block lax.map (the fixed relay RTT cancels exactly).

    The 64-block span keeps the SIGNAL well above relay jitter even for very
    cheap kernels (a ~0.5 ms/block 1M int8 scan = 32 ms of span signal vs
    ~5 ms jitter). The old 17-vs-1 design carried only ~8 ms of signal there,
    and its amortized-fallback heuristic flipped between modes run-to-run —
    the r5 record shows the same line at 124.5k and 32.5k QPS in back-to-back
    runs. If the marginal still comes out non-positive (hard relay noise),
    fall back to the amortized per-block wall — a conservative upper bound."""
    import jax
    import jax.numpy as jnp

    def mk(seed):
        i = np.random.default_rng(seed).choice(len(q_src), sb, replace=False)
        q = q_src[i] + 1e-4 * np.random.default_rng(seed + 1).standard_normal((sb, d), dtype=np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    p_small = [
        jnp.asarray(np.stack([mk(100 + b_small * i + j) for j in range(b_small)]))
        for i in range(reps)
    ]
    p_big = [
        jnp.asarray(np.stack([mk(200 + b_big * i + j) for j in range(b_big)]))
        for i in range(reps)
    ]
    # DEDICATED warmup pools: re-dispatching the same arrays in the timed
    # loop would let the relay's identical-dispatch dedup serve rep 0 from
    # cache and bias the min-over-reps low
    wu_s = jnp.asarray(np.stack([mk(9000 + j) for j in range(b_small)]))
    wu_b = jnp.asarray(np.stack([mk(9100 + j) for j in range(b_big)]))
    fb = jax.jit(lambda ix, qb: jax.lax.map(lambda v: sfn(ix, v), qb))
    np.asarray(fb(index, wu_s)[0, 0, 0])  # warm both shapes
    np.asarray(fb(index, wu_b)[0, 0, 0])
    w1 = wn = float("inf")
    for i in range(reps):
        t = time.time(); np.asarray(fb(index, p_small[i])[-1, -1]); w1 = min(w1, time.time() - t)
        t = time.time(); np.asarray(fb(index, p_big[i])[-1, -1]); wn = min(wn, time.time() - t)
    marginal = (wn - w1) / (b_big - b_small) * 1000
    amortized = wn / b_big * 1000
    return marginal if marginal > 0 else amortized


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--q", type=int, default=2048)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--skip_bm25", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vod_tpu.configs.search import DenseFactoryConfig
    from vod_tpu.search import SearchQueries, build_dense_index
    from vod_tpu.search.dense import dense_search, ivf_search, pq_search
    from vod_tpu.search.factory import build_dense_from_config
    from vod_tpu.search.ivfpq import ivfpq_search

    passages = harvest(args.n)
    cache = pathlib.Path(f"/tmp/realtext_emb_{len(passages)}_{args.dim}_{args.steps}.npz")
    emb, q_emb, qrows, qtexts = train_and_embed(passages, args, cache)
    results: dict = {"n": len(passages), "dim": args.dim, "q": args.q, "corpus": "real-text"}

    # spectrum: the property that separates real embeddings from PRNG slabs
    sample = emb[np.random.default_rng(1).choice(len(emb), 50_000, replace=False)]
    eig = np.sort(np.linalg.eigvalsh(np.cov(sample.T)))[::-1]
    shares = np.cumsum(eig) / eig.sum()
    results["top64_variance_share"] = round(float(shares[63]), 4)
    log(f"spectrum: top64 variance share {results['top64_variance_share']}")

    # exact f32 ground truth on device
    jq = jnp.asarray(q_emb)
    flat = build_dense_index(jnp.asarray(emb), dtype="float32", approx_recall=None)
    gt_i = np.asarray(dense_search(flat, SearchQueries(vector=jq), top_k=K).indices)
    self_hit = float(np.mean([qrows[i] in set(gt_i[i].tolist()) for i in range(args.q)]))
    results["encoder_self_hit10"] = round(self_hit, 4)
    log(f"encoder self-retrieval hit@10 (exact): {self_hit:.3f}")
    del flat

    def dispatch(index):
        from vod_tpu.search.dense import DenseIndex, IVFIndex, PQIndex
        from vod_tpu.search.ivfpq import IVFPQIndex

        if isinstance(index, PQIndex):
            return pq_search
        if isinstance(index, IVFPQIndex):
            return ivfpq_search
        if isinstance(index, IVFIndex):
            return ivf_search
        return dense_search

    codecs = {
        "int8": DenseFactoryConfig(codec="int8"),
        # faiss PQ{M}x4fs + Refine analogue (exhaustive fast-scan + exact rerank)
        "pq96x4fs+ref": DenseFactoryConfig(
            codec="pq", n_subquantizers=96, code_bits=4, coarse_dim=None,
            refine="int8", refine_dim=192, k_factor=8, train_size=200_000,
        ),
        # the serving codec: coarse int8 scan -> exact rerank, no ADC stage
        "serving-direct": DenseFactoryConfig(
            codec="pq", coarse_dim=96, refine="int8", refine_dim=192,
            keep_codes=False, k_factor=8, train_size=200_000, approx_recall=0.95,
        ),
        # ivfpq-SOAR is demoted out of this bench (VERDICT r4 #4): measured
        # dominated by serving-direct at every batch size at 8.8M — see
        # examples/ivfpq_crossover_bench.py and STATUS.md round-5. Build one
        # here with DenseFactoryConfig(codec="ivfpq", spill=True, ...) if
        # comparing engines.
    }
    jemb = jnp.asarray(emb)
    for name, cfg in codecs.items():
        t0 = time.time()
        index = build_dense_from_config(cfg, jemb, rng=jax.random.PRNGKey(0))
        build_s = time.time() - t0
        sfn_raw = dispatch(index)
        sfn = lambda ix, v: sfn_raw(ix, SearchQueries(vector=v), top_k=K).indices
        got = np.asarray(jax.jit(sfn)(index, jq))
        rec = float(np.mean(
            [len(set(got[i].tolist()) & set(gt_i[i].tolist())) / K for i in range(args.q)]
        ))
        # block QPS (2048 amortized): marginal 2x-block vs 1x-block.
        # BOTH shapes warmed first — an unwarmed 2x shape would time XLA
        # compilation, not the search (the r2-eval trap).
        f = jax.jit(sfn)
        jq2 = jnp.concatenate([jq, jq + 1e-5], axis=0)
        _ = np.asarray(f(index, jq))
        _ = np.asarray(f(index, jq2))
        t1 = time.time(); _ = np.asarray(f(index, jq)); d1 = time.time() - t1
        t2 = time.time(); _ = np.asarray(f(index, jq2)); d2 = time.time() - t2
        qps = args.q / max(d2 - d1, 1e-9)
        sv_ms = serve_ms_block(sfn, index, q_emb, args.dim)
        results[name] = {
            "recall10": round(rec, 4), "block_qps": round(qps, 1),
            "serve64_qps": round(64 / (sv_ms / 1000), 1), "build_s": round(build_s, 1),
        }
        log(f"{name}: recall@10 {rec:.4f}, block QPS {qps:,.0f}, "
            f"B=64 serving {64/(sv_ms/1000):,.0f} QPS (build {build_s:.0f}s)")
        del index

    if not args.skip_bm25:
        # Stemmed vs unstemmed BM25 gold-hit@10 at the full corpus size, on
        # TWO query sets: verbatim windows (exact-match is optimal — stemming
        # can only add collisions here) and morphologically INFLECTED windows
        # (pluralized content words — the regime stemming exists for; parity:
        # ES language analyzers stem, es_body.py:32,101).
        from vod_tpu.native import analyze_texts
        from vod_tpu.search import build_sparse_index_native
        from vod_tpu.search.sparse import sparse_search

        def inflect(text: str) -> str:
            return " ".join(
                w + "s" if w.isalpha() and len(w) > 3 and not w.endswith("s") else w
                for w in text.split()
            )

        q_variants = {"": qtexts, "_inflected": [inflect(t) for t in qtexts]}
        contents = [p["content"] for p in passages]
        for stem in (False, True):
            t0 = time.time()
            d_ids, d_counts = analyze_texts(
                contents, vocab_size=1 << 18, max_terms=64, stem=stem
            )
            doc_terms = [d_ids[i, : d_counts[i]].tolist() for i in range(len(contents))]
            sidx = build_sparse_index_native(doc_terms, n_terms=1 << 18, max_postings=2048)
            build_s = time.time() - t0
            key = "bm25_stemmed" if stem else "bm25_unstemmed"
            results[key] = {"build_s": round(build_s, 1)}
            for suffix, texts in q_variants.items():
                q_ids, _q_counts = analyze_texts(
                    texts, vocab_size=1 << 18, max_terms=32, stem=stem
                )
                out = sparse_search(
                    sidx, SearchQueries(terms=jnp.asarray(q_ids)), top_k=K
                )
                got = np.asarray(out.indices)
                hit = float(np.mean(
                    [qrows[i] in set(got[i].tolist()) for i in range(args.q)]
                ))
                results[key][f"gold_hit10{suffix}"] = round(hit, 4)
                log(f"{key}: gold-hit@10{suffix} {hit:.4f}")
            del sidx

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
