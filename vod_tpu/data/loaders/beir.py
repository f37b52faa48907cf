"""BeIR dataset loader.

Parity: reference `vod_datasets/loaders/beir.py:102` (`BeirDatasetLoader`):
loads a BeIR benchmark subset (msmarco, nq, fiqa, scifact, nfcorpus, ...) from
the HF hub (`BeIR/<subset>` corpus/queries + `BeIR/<subset>-qrels`), turning
qrels into per-query `retrieval_ids`/`retrieval_scores`
(`_FilterAndAssignRetrievalIds:233`).

Network-gated: this environment is zero-egress, so loading works only against a
pre-populated HF cache; the loader degrades with a clear error otherwise.
"""

from __future__ import annotations

import typing as typ

SUBSETS = [
    "msmarco", "trec-covid", "nfcorpus", "nq", "hotpotqa", "fiqa",
    "arguana", "webis-touche2020", "cqadupstack", "quora", "dbpedia-entity",
    "scidocs", "fever", "climate-fever", "scifact",
]


class BeirDatasetLoader:
    """Callable loader usable as `name_or_path` in dataset configs."""

    def __init__(self, what: typ.Literal["queries", "sections"] = "queries"):
        self.what = what

    def __call__(
        self, subsets: typ.Optional[list[str]] = None, split: str = "test", **kw: typ.Any
    ) -> typ.Any:
        import datasets as hf

        subset = (subsets or ["scifact"])[0]
        if subset not in SUBSETS:
            raise ValueError(f"Unknown BeIR subset {subset!r}; known: {SUBSETS}")
        try:
            if self.what == "sections":
                corpus = hf.load_dataset(f"BeIR/{subset}", "corpus", split="corpus")
                return corpus.map(
                    lambda r: {
                        "id": str(r["_id"]),
                        "content": r["text"],
                        "title": r.get("title") or None,
                        "subset_id": None,
                    },
                    remove_columns=corpus.column_names,
                    desc=f"beir:{subset}:sections",
                )
            queries = hf.load_dataset(f"BeIR/{subset}", "queries", split="queries")
            qrels = hf.load_dataset(f"BeIR/{subset}-qrels", split=split)
            by_query: dict[str, list[tuple[str, float]]] = {}
            for row in qrels:
                by_query.setdefault(str(row["query-id"]), []).append(
                    (str(row["corpus-id"]), float(row["score"]))
                )

            def to_query(r: dict) -> dict:
                rels = by_query.get(str(r["_id"]), [])
                return {
                    "id": str(r["_id"]),
                    "query": r["text"],
                    "answers": [],
                    "answer_scores": [],
                    "retrieval_ids": [x for x, _ in rels],
                    "retrieval_scores": [s for _, s in rels],
                    "subset_ids": [],
                }

            out = queries.map(to_query, remove_columns=queries.column_names, desc=f"beir:{subset}:queries")
            # keep only queries with at least one qrel (parity: `:233-259`)
            return out.filter(lambda r: len(r["retrieval_ids"]) > 0)
        except Exception as exc:  # zero-egress guard
            raise RuntimeError(
                f"BeIR/{subset} is not available offline (zero-egress environment); "
                "pre-populate the HF cache to use this loader"
            ) from exc
