"""Split queries-with-contexts datasets into separate query + section shards.

Parity: reference `vod_datasets/rosetta/preprocessing.py:155`
(`isolate_qa_and_sections`): explode contexts into sections with content-hash
ids, dedupe, and link queries to their sections via `retrieval_ids`/`subset_ids`.
"""

from __future__ import annotations

import hashlib
import typing as typ


def _content_hash(content: str, title: typ.Optional[str]) -> str:
    h = hashlib.blake2b(digest_size=8)
    h.update((title or "").encode())
    h.update(b"\x00")
    h.update(content.encode())
    return h.hexdigest()


def isolate_qa_and_sections(
    data: typ.Any, *, link_by_subset: bool = True
) -> tuple[typ.Any, typ.Any]:
    """(queries_with_contexts rows) -> (queries dataset/list, sections dataset/list).

    Sections are deduplicated by content hash; each query gets `retrieval_ids`
    pointing at its contexts' section ids and, when `link_by_subset`, a
    `subset_ids` entry restricting its search space to those sections (parity:
    `preprocessing.py:92`).
    """
    rows: typ.Iterable[dict]
    is_hf = False
    try:
        import datasets as hf_datasets

        is_hf = isinstance(data, hf_datasets.Dataset)
    except Exception:
        pass
    rows = data if not is_hf else data

    queries: list[dict] = []
    sections_by_id: dict[str, dict] = {}
    for row in rows:
        contexts = row["contexts"]
        titles = row.get("titles") or [None] * len(contexts)
        sec_ids = []
        for content, title in zip(contexts, titles):
            sid = _content_hash(content, title)
            if sid not in sections_by_id:
                sections_by_id[sid] = {
                    "id": sid,
                    "content": content,
                    "title": title,
                    "subset_id": sid if link_by_subset else None,
                }
            sec_ids.append(sid)
        q = {k: v for k, v in row.items() if k not in ("contexts", "titles")}
        q["retrieval_ids"] = sec_ids
        q["retrieval_scores"] = [1.0] * len(sec_ids)
        q["subset_ids"] = sec_ids if link_by_subset else []
        queries.append(q)

    sections = list(sections_by_id.values())
    if is_hf:
        import datasets as hf_datasets

        return (
            hf_datasets.Dataset.from_list(queries),
            hf_datasets.Dataset.from_list(sections),
        )
    return queries, sections
