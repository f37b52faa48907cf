"""BeIR dataset loader.

Parity: reference `vod_datasets/loaders/beir.py:102` (`BeirDatasetLoader`):
loads a BeIR benchmark subset (msmarco, nq, fiqa, scifact, nfcorpus, ...) —
either from a local BeIR-format directory (`corpus.jsonl` + `queries.jsonl` +
`qrels/<split>.tsv`, the layout of the TU-Darmstadt zips the reference
downloads, `:109-127`) or from the HF hub (`BeIR/<subset>` corpus/queries +
`BeIR/<subset>-qrels`) — turning qrels into per-query
`retrieval_ids`/`retrieval_scores` (`_FilterAndAssignRetrievalIds:233`).

HF is network-gated: this environment is zero-egress, so hub loading works only
against a pre-populated cache; local directories always work.
"""

from __future__ import annotations

import json
import pathlib
import typing as typ

SUBSETS = [
    "msmarco", "trec-covid", "nfcorpus", "nq", "hotpotqa", "fiqa",
    "arguana", "webis-touche2020", "cqadupstack", "quora", "dbpedia-entity",
    "scidocs", "fever", "climate-fever", "scifact",
]


def _read_jsonl(path: pathlib.Path) -> list[dict]:
    return [json.loads(line) for line in path.read_text().splitlines() if line.strip()]


def _read_qrels_tsv(path: pathlib.Path) -> dict[str, list[tuple[str, float]]]:
    """TSV `query-id<TAB>corpus-id<TAB>score` (with optional header row)."""
    by_query: dict[str, list[tuple[str, float]]] = {}
    for line in path.read_text().splitlines():
        parts = line.strip().split("\t")
        if len(parts) < 3 or parts[0] in ("query-id", "qid"):
            continue
        by_query.setdefault(str(parts[0]), []).append((str(parts[1]), float(parts[-1])))
    return by_query


class BeirDatasetLoader:
    """Callable loader usable as `name_or_path` in dataset configs."""

    def __init__(self, what: typ.Literal["queries", "sections"] = "queries"):
        self.what = what

    def _load_local(self, root: pathlib.Path, split: str) -> list[dict]:
        """BeIR directory layout (parity: the reference's unzipped downloads)."""
        if self.what == "sections":
            return [
                {
                    "id": str(r["_id"]),
                    "content": r["text"],
                    "title": r.get("title") or None,
                    "subset_id": None,
                }
                for r in _read_jsonl(root / "corpus.jsonl")
            ]
        by_query = _read_qrels_tsv(root / "qrels" / f"{split}.tsv")
        out = []
        for r in _read_jsonl(root / "queries.jsonl"):
            rels = by_query.get(str(r["_id"]), [])
            if not rels:  # parity: queries without qrels are dropped (`:233-259`)
                continue
            out.append({
                "id": str(r["_id"]),
                "query": r["text"],
                "answers": [],
                "answer_scores": [],
                "retrieval_ids": [x for x, _ in rels],
                "retrieval_scores": [s for _, s in rels],
                "subset_ids": [],
            })
        return out

    def __call__(
        self, subsets: typ.Optional[list[str]] = None, split: str = "test", **kw: typ.Any
    ) -> typ.Any:
        import datasets as hf

        subset = (subsets or ["scifact"])[0]
        local = pathlib.Path(subset)
        if local.is_dir():  # BeIR-format directory
            return self._load_local(local, split)
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
