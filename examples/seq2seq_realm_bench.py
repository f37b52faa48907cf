"""Seq2seq-reader REALM train-step timing (BASELINE config #5 shape).

The full fused live-retrieval step — encode queries with the CURRENT encoder,
dense search over a 200k-section corpus in HBM, priority-sample sections,
assemble [context; question; answer] LM inputs, T5 encoder-decoder
teacher-forced forward/backward through the VOD estimator, adamw update — as
ONE XLA program, with an e5-small-shaped retriever and a t5-small-shaped
reader (~70M params total).

Companion to the round-1 causal-reader measurement (53 ms/step, 57M params):
this replaces the causal reader with the T5 encoder-decoder reader the
reference names in BASELINE config #5 ("e5 retriever + T5 reader").

Run: python examples/seq2seq_realm_bench.py [--corpus 200000] [--steps 20]
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
    ap.add_argument("--corpus", type=int, default=200_000)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n_sections", type=int, default=8)
    ap.add_argument("--ls", type=int, default=64, help="section tokens")
    ap.add_argument("--lq", type=int, default=24, help="query tokens")
    ap.add_argument(
        "--index_dtype", default="bfloat16", choices=["bfloat16", "int8", "float32"],
        help="dense index codec; int8 halves index HBM at >=1M corpora",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vod_tpu.models import VodGradients, TransformerEncoderConfig, VodPoolerConfig
    from vod_tpu.models.seq2seq import Seq2SeqRealm
    from vod_tpu.models.t5_encoder import T5EncoderConfig
    from vod_tpu.runtime import DeviceCorpus
    from vod_tpu.runtime.collate import QueryBatch, device_collate
    from vod_tpu.runtime.train import make_train_step
    from vod_tpu.search import HybridEngines, build_dense_index

    n, b, d = args.corpus, args.batch, args.n_sections
    vocab, h = 30522, 384
    print(f"# corpus {n} sections x {args.ls} tokens; B={b}, D={d}", flush=True)

    # corpus token ids + the initial embedding matrix are generated ON DEVICE:
    # at 1M sections the host arrays (256 MB ids + 1.5 GB f32 emb) would crawl
    # over the remote-execution tunnel as host->device transfers.
    corpus = DeviceCorpus(
        input_ids=jax.random.randint(
            jax.random.PRNGKey(7), (n, args.ls), 4, vocab, dtype=jnp.int32
        ),
        attention_mask=jnp.ones((n, args.ls), jnp.int32),
        subset_ids=jnp.zeros((n,), jnp.int32),
    )

    enc_cfg = TransformerEncoderConfig(
        vocab_size=vocab, hidden_size=h, num_layers=6, num_heads=6,
        intermediate_size=1536,
        pooler=VodPoolerConfig(agg_method="mean", output_norm="l2", scaler=10.0),
    )
    reader_cfg = T5EncoderConfig(
        vocab_size=vocab, hidden_size=h, num_layers=6, num_heads=6, head_dim=64,
        intermediate_size=1536,
    )
    model = Seq2SeqRealm(cfg=enc_cfg, reader_cfg=reader_cfg, gradients=VodGradients(alpha=0.5))
    tx = optax.adamw(5e-5)
    step_fn = make_train_step(
        model, tx, prefetch=64, n_sections=d, max_pos_sections=2, with_lm=True,
        gradient_clip_val=1.0,
    )

    def make_queries(seed: int) -> QueryBatch:
        r = np.random.default_rng(seed)
        gold = r.integers(0, n, size=b)
        return QueryBatch(
            input_ids=jnp.asarray(r.integers(4, vocab, size=(b, args.lq)), jnp.int32),
            attention_mask=jnp.ones((b, args.lq), jnp.int32),
            section_ids=jnp.asarray(gold[:, None].astype("int32")),
            answer_ids=jnp.asarray(r.integers(4, vocab, size=(b, 12)), jnp.int32),
            answer_mask=jnp.ones((b, 12), jnp.int32),
        )

    emb = jax.random.normal(jax.random.PRNGKey(8), (n, h), jnp.float32)
    engines = HybridEngines(dense=build_dense_index(emb, dtype=args.index_dtype))
    del emb

    init_batch, _ = device_collate(
        jax.random.PRNGKey(0), engines, corpus, make_queries(0),
        query_vectors=jnp.zeros((b, h)), prefetch=64, n_sections=d,
        max_pos_sections=2, with_lm=True,
    )
    n_params = 0
    params = model.init(jax.random.PRNGKey(0), init_batch, mode="evaluate")
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(params))
    print(f"# params: {n_params/1e6:.1f}M", flush=True)
    opt_state = tx.init(params)

    weights = {"dense": jnp.asarray(1.0)}
    t0 = time.time()
    params, opt_state, metrics, _rel, _scores = step_fn.train_step(
        params, opt_state, engines, corpus, make_queries(1), jax.random.PRNGKey(1), weights
    )
    float(metrics["loss"])
    print(f"# compile + first step: {time.time()-t0:.0f}s", flush=True)

    # untimed warm steps: the first post-compile steps still pay one-time
    # device/cache effects (measured: a 10-step window right after compile
    # reads 90 ms/step where a 50-step window reads 85.8 — the r3 "regression"
    # to 89.8 was exactly this sampling artifact)
    for i in range(3):
        params, opt_state, metrics, _rel, _scores = step_fn.train_step(
            params, opt_state, engines, corpus, make_queries(9000 + i),
            jax.random.PRNGKey(9000 + i), weights,
        )
    float(metrics["loss"])

    t0 = time.time()
    for i in range(args.steps):
        params, opt_state, metrics, _rel, _scores = step_fn.train_step(
            params, opt_state, engines, corpus, make_queries(2 + i),
            jax.random.PRNGKey(2 + i), weights,
        )
    loss = float(metrics["loss"])  # forces completion of the chain
    dt = (time.time() - t0) / args.steps
    print(f"# steady state: {dt*1e3:.1f} ms/step (loss={loss:.3f})", flush=True)

    # provisional JSON line BEFORE the reindex stage: if the bench
    # orchestrator's deadline kills this process mid-reindex, the ms/step
    # measurement still reaches the driver record (bench.py keeps the LAST
    # JSON line, so the final result below supersedes this one)
    print(json.dumps({
        "ms_per_step": round(dt * 1e3, 1), "params_m": round(n_params / 1e6, 1),
        "corpus": n, "batch": b, "n_sections": d, "loss": loss,
        "index_dtype": args.index_dtype,
    }), flush=True)

    # periodic-boundary reindex: re-embed the corpus with the CURRENT encoder
    # and swap the index (the in-loop reindexing of BASELINE config #5)
    from vod_tpu.models.systems import Ranker
    from vod_tpu.runtime.predict import compute_embeddings

    encode = lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field)
    t0 = time.time()
    # wider chunks at big corpora: 1M/2048 = 512 relay round-trips (~30 ms
    # fixed RTT each) would put ~15 s of pure dispatch latency on the clock
    emb2 = compute_embeddings(encode, params, corpus, chunk=2048 if n <= 262_144 else 8192)
    engines = HybridEngines(dense=build_dense_index(emb2, dtype=args.index_dtype))
    del emb2
    params, opt_state, metrics, _rel, _scores = step_fn.train_step(
        params, opt_state, engines, corpus, make_queries(999), jax.random.PRNGKey(999), weights
    )
    float(metrics["loss"])  # new index live again
    reindex_s = time.time() - t0
    print(f"# reindex (re-embed + rebuild + first step): {reindex_s:.1f}s", flush=True)

    result = {"ms_per_step": round(dt * 1e3, 1), "params_m": round(n_params / 1e6, 1),
              "corpus": n, "batch": b, "n_sections": d, "loss": loss,
              "reindex_s": round(reindex_s, 1), "index_dtype": args.index_dtype}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
