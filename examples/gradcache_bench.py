"""GradCache memory-proof: 16k+ fused encoder rows on ONE v5e chip.

Trains a BERT-base-sized Ranker (109M params, bf16 compute) with in-batch
negatives at B=2048 queries x 8 sections -> a ~18k-row fused encoder pass at
L=128. The monolithic backward must retain ~12 layers x 18k x 128 x 768
activations (~40+ GB) — far past 16GB HBM; GradCache's peak is ONE chunk's
pass + the pooled [rows, 768] encodings (~55 MB), so the same step fits.

Prints one line per configuration: rows, step wall, loss (finite), or OOM.

Run: python examples/gradcache_bench.py [--b 2048] [--chunk 1024] [--also_monolithic]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--n_sections", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--ls", type=int, default=128)
    ap.add_argument("--n_corpus", type=int, default=100_000)
    ap.add_argument("--also_monolithic", action="store_true",
                    help="attempt the fused backward at the same shape (expected OOM)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vod_tpu.models import (
        Ranker, RetrievalGradients, TransformerEncoderConfig, VodPoolerConfig,
    )
    from vod_tpu.runtime import DeviceCorpus, QueryBatch, device_collate
    from vod_tpu.runtime.train import make_train_step
    from vod_tpu.search import HybridEngines, build_dense_index

    VOCAB = 30522
    cfg = TransformerEncoderConfig(
        vocab_size=VOCAB, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, dtype=jnp.bfloat16,
        pooler=VodPoolerConfig(agg_method="mean", output_norm="l2", scaler=20.0),
    )
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())

    rng = np.random.default_rng(0)
    corpus = DeviceCorpus(
        input_ids=jnp.asarray(
            rng.integers(4, VOCAB, size=(args.n_corpus, args.ls)).astype("int32")
        ),
        attention_mask=jnp.ones((args.n_corpus, args.ls), "int32"),
    )
    emb = jnp.asarray(rng.standard_normal((args.n_corpus, 768), dtype=np.float32))
    engines = HybridEngines(dense=build_dense_index(emb, dtype="bfloat16"))

    def qb(seed: int) -> QueryBatch:
        r = np.random.default_rng(seed)
        return QueryBatch(
            input_ids=jnp.asarray(r.integers(4, VOCAB, size=(args.b, 32)).astype("int32")),
            attention_mask=jnp.ones((args.b, 32), "int32"),
            section_ids=jnp.asarray(
                r.integers(0, args.n_corpus, size=(args.b, 1)).astype("int32")
            ),
        )

    # init on a TINY batch (init only touches shapes via one row of each field)
    small_q = QueryBatch(
        input_ids=jnp.asarray(rng.integers(4, VOCAB, size=(2, 32)).astype("int32")),
        attention_mask=jnp.ones((2, 32), "int32"),
        section_ids=jnp.asarray(rng.integers(0, args.n_corpus, size=(2, 1)).astype("int32")),
    )
    b0, _ = jax.jit(lambda k, qv: device_collate(
        k, engines, corpus, small_q, query_vectors=qv, prefetch=16,
        n_sections=args.n_sections, max_pos_sections=2, in_batch_negatives=True,
    ))(jax.random.PRNGKey(0), emb[:2])
    params0 = model.init(jax.random.PRNGKey(1), b0, mode="evaluate")
    nparam = sum(x.size for x in jax.tree.leaves(params0))
    rows = args.b + args.b * args.n_sections  # upper bound (flat pool dedups)
    print(f"# params {nparam/1e6:.1f}M | B={args.b} x {args.n_sections} sections "
          f"-> <= {rows} fused rows at L={args.ls}", flush=True)

    configs = [("gradcache", args.chunk)]
    if args.also_monolithic:
        configs.append(("monolithic", None))
    for name, chunk in configs:
        tx = optax.adafactor(1e-5)  # adam moments at 109M x f32 x2 would not help the comparison
        step = make_train_step(
            model, tx, prefetch=16, n_sections=args.n_sections, max_pos_sections=2,
            gradient_clip_val=1.0, in_batch_negatives=True, gradcache_chunk_rows=chunk,
        )
        p = jax.tree.map(jnp.copy, params0)
        o = tx.init(p)
        try:
            t0 = time.time()
            p, o, m, _, _ = step.train_step(p, o, engines, corpus, qb(1), jax.random.PRNGKey(2), {})
            l0 = float(m["loss"])
            compile_s = time.time() - t0
            t0 = time.time()
            p, o, m, _, _ = step.train_step(p, o, engines, corpus, qb(2), jax.random.PRNGKey(3), {})
            l1 = float(m["loss"])
            wall = time.time() - t0
            assert np.isfinite(l1)
            print(f"{name}(chunk={chunk}): loss {l0:.4f} -> {l1:.4f} | "
                  f"step {wall:.1f}s (compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — we want the OOM proof inline
            kind = type(e).__name__
            msg = str(e).splitlines()[0][:120]
            print(f"{name}(chunk={chunk}): FAILED {kind}: {msg}", flush=True)
        del p, o, step


if __name__ == "__main__":
    main()
