"""Hub-checkpoint retrieval eval: port a real encoder, embed BeIR, report
recall@10 / ndcg@10 vs the exact flat ground truth (BASELINE config #2 shape).

Cache-gated (VERDICT r2 #6): this zero-egress environment cannot download, so
the script probes the HF cache first and SKIPS with a clear message when the
checkpoint or dataset is absent — it runs green the moment a cache appears.

Parity: reference `vod_datasets/interface.py:43` (load + rosetta) + the hydra
encoder presets (e5 family) + `workflows/benchmark.py:21` metric harness.

Usage:
  python examples/hub_checkpoint_eval.py \
      [--model intfloat/e5-small-v2] [--beir scifact | /path/to/beir_dir]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def _probe_hf_cache(model: str) -> bool:
    """True iff the tokenizer+weights resolve offline."""
    import os

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    try:
        import transformers

        transformers.AutoTokenizer.from_pretrained(model)
        transformers.AutoConfig.from_pretrained(model)
        return True
    except Exception:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="intfloat/e5-small-v2")
    ap.add_argument("--beir", default="scifact", help="BeIR subset name or local BeIR dir")
    ap.add_argument("--split", default="test")
    ap.add_argument("--max_length", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--e5_prefixes", action="store_true", default=None,
                    help="prepend 'query: '/'passage: ' (auto for e5 models)")
    args = ap.parse_args()

    if not _probe_hf_cache(args.model):
        print(
            f"SKIPPED: {args.model!r} is not in the local HF cache and this "
            "environment has no network egress. Pre-populate the cache "
            "(HF_HOME) and re-run; the harness needs no other change."
        )
        return 0

    beir_local = pathlib.Path(args.beir).is_dir()
    if not beir_local:
        try:
            import datasets as hf

            hf.load_dataset(f"BeIR/{args.beir}", "queries", split="queries")
        except Exception:
            print(
                f"SKIPPED: model cache found, but BeIR/{args.beir} is not cached "
                "and there is no egress. Pass --beir /path/to/beir_dir (BeIR "
                "layout: corpus.jsonl, queries.jsonl, qrels/<split>.tsv) or "
                "populate the datasets cache."
            )
            return 0

    import jax
    import jax.numpy as jnp
    import transformers

    from vod_tpu.data.loaders.beir import BeirDatasetLoader
    from vod_tpu.models import Ranker, RetrievalGradients, VodPoolerConfig
    from vod_tpu.models.hf_import import load_hf_encoder
    from vod_tpu.runtime.predict import compute_embeddings_to_host
    from vod_tpu.search import SearchQueries, build_dense_index
    from vod_tpu.search.dense import dense_search

    t0 = time.time()
    use_prefix = args.e5_prefixes if args.e5_prefixes is not None else ("e5" in args.model)
    pooler = VodPoolerConfig(agg_method="mean", output_norm="l2")
    cfg, params = load_hf_encoder(args.model, pooler=pooler)
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())
    tok = transformers.AutoTokenizer.from_pretrained(args.model)
    print(f"# ported {args.model} ({time.time()-t0:.0f}s)", flush=True)

    queries = BeirDatasetLoader("queries")([args.beir], split=args.split)
    sections = BeirDatasetLoader("sections")([args.beir], split=args.split)
    sec_rows = list(sections) if not isinstance(sections, list) else sections
    q_rows = list(queries) if not isinstance(queries, list) else queries
    sec_id_to_row = {r["id"]: i for i, r in enumerate(sec_rows)}
    print(f"# beir {args.beir}: {len(q_rows)} queries, {len(sec_rows)} sections", flush=True)

    def encode_texts(texts: list[str], prefix: str) -> np.ndarray:
        enc = tok(
            [prefix + t for t in texts], padding="max_length", truncation=True,
            max_length=args.max_length, return_tensors="np",
        )
        apply = lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field)
        return compute_embeddings_to_host(
            apply, params, enc["input_ids"].astype(np.int32),
            enc["attention_mask"].astype(np.int32), chunk=args.chunk,
        )

    sec_texts = [((r.get("title") or "") + " " + r["content"]).strip() for r in sec_rows]
    emb = encode_texts(sec_texts, "passage: " if use_prefix else "")
    q_emb = encode_texts([r["query"] for r in q_rows], "query: " if use_prefix else "")
    embed_s = time.time() - t0

    index = build_dense_index(jnp.asarray(emb), dtype="float32", approx_recall=None)
    out = dense_search(index, SearchQueries(vector=jnp.asarray(q_emb)), top_k=10)
    got = np.asarray(out.indices)

    recalls, ndcgs = [], []
    for i, r in enumerate(q_rows):
        gold = {sec_id_to_row[g] for g in r["retrieval_ids"] if g in sec_id_to_row}
        if not gold:
            continue
        hits = [int(x) in gold for x in got[i]]
        recalls.append(sum(hits) / min(len(gold), 10))
        dcg = sum(h / np.log2(rank + 2) for rank, h in enumerate(hits))
        idcg = sum(1 / np.log2(rank + 2) for rank in range(min(len(gold), 10)))
        ndcgs.append(dcg / idcg)

    result = {
        "model": args.model, "beir": args.beir,
        "n_queries": len(recalls), "n_sections": len(sec_rows),
        "recall_10": round(float(np.mean(recalls)), 4),
        "ndcg_10": round(float(np.mean(ndcgs)), 4),
        "embed_s": round(embed_s, 1),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
