"""Pretty printers for batches / configs / metrics / params.

Parity: reference `vod_tools/pretty/` — rich-table batch/config/metric/param
printers and `pprint_retrieval_batch` (detokenize + show top sections,
`print_batch.py:299`). Uses `rich` when available, plain text otherwise.
"""

from __future__ import annotations

import typing as typ

import numpy as np


def _console():
    try:
        import rich.console

        return rich.console.Console()
    except Exception:
        return None


def _shape_dtype(v: typ.Any) -> str:
    if hasattr(v, "shape") and hasattr(v, "dtype"):
        return f"{tuple(v.shape)} {v.dtype}"
    return type(v).__name__


def pprint_batch(batch: typ.Any, header: str = "batch") -> None:
    """Tabulate a batch's fields with shapes/dtypes (parity: `pprint_batch`)."""
    items: list[tuple[str, str]] = []
    source = batch.__dict__ if hasattr(batch, "__dict__") else dict(batch)
    for k, v in source.items():
        if v is None or k in ("extras", "diagnostics"):
            continue
        items.append((k, _shape_dtype(v)))
    console = _console()
    if console is not None:
        import rich.table

        table = rich.table.Table(title=header)
        table.add_column("field")
        table.add_column("shape / dtype")
        for k, s in items:
            table.add_row(k, s)
        console.print(table)
    else:
        print(f"== {header} ==")
        for k, s in items:
            print(f"  {k:28s} {s}")


def pprint_metrics(metrics: typ.Mapping[str, typ.Any], header: str = "metrics") -> None:
    console = _console()
    rows = [(k, f"{float(v):.4f}" if isinstance(v, (int, float, np.floating)) else str(v)) for k, v in metrics.items()]
    if console is not None:
        import rich.table

        table = rich.table.Table(title=header)
        table.add_column("metric")
        table.add_column("value", justify="right")
        for k, v in rows:
            table.add_row(k, v)
        console.print(table)
    else:
        print(f"== {header} ==")
        for k, v in rows:
            print(f"  {k:24s} {v}")


def pprint_params(params: typ.Any, header: str = "parameters") -> dict[str, int]:
    """Print per-subtree parameter counts; returns {path: count}
    (parity: `pprint_model_stats` / `vod_exps/utils.py:51`)."""
    import jax

    counts: dict[str, int] = {}
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = jax.tree_util.keystr(path)
        top = key.split("'")[1] if "'" in key else key
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        counts[top] = counts.get(top, 0) + n
        total += n
    console = _console()
    rows = [(k, f"{v:,}") for k, v in sorted(counts.items())] + [("TOTAL", f"{total:,}")]
    if console is not None:
        import rich.table

        table = rich.table.Table(title=header)
        table.add_column("subtree")
        table.add_column("params", justify="right")
        for k, v in rows:
            table.add_row(k, v)
        console.print(table)
    else:
        print(f"== {header} ==")
        for k, v in rows:
            print(f"  {k:24s} {v}")
    return counts


def pprint_retrieval_batch(
    batch: typ.Any, tokenizer: typ.Any, top_sections: int = 3, max_queries: int = 2
) -> None:
    """Detokenize queries + their top sections (parity: `print_batch.py:299`)."""
    q_ids = np.asarray(batch.query__input_ids)
    s_ids = np.asarray(batch.section__input_ids)
    scores = np.asarray(batch.section__score)
    b, d = scores.shape
    s_ids = s_ids.reshape(-1, s_ids.shape[-1])
    shared_pool = s_ids.shape[0] != b * d
    for i in range(min(b, max_queries)):
        print(f"query[{i}]: {tokenizer.decode([t for t in q_ids[i] if t > 0], skip_special_tokens=True)!r}")
        order = np.argsort(-np.where(np.isfinite(scores[i]), scores[i], -np.inf))[:top_sections]
        for rank, j in enumerate(order):
            row = j if shared_pool else i * d + j
            text = tokenizer.decode([t for t in s_ids[row] if t > 0], skip_special_tokens=True)
            print(f"   #{rank} score={scores[i, j]:+.3f}: {text!r}")


def render_retrieval_batch_html(
    batch: typ.Any, tokenizer: typ.Any, top_sections: int = 5, max_queries: int = 4
) -> str:
    """HTML table of queries + their top sections (parity: the reference's
    first-batch wandb HTML dump, `vod_ops/utils/logging.py:31`). Feed to
    `TrackerLogger.log_text`."""
    import html as _html

    q_ids = np.asarray(batch.query__input_ids)
    s_ids = np.asarray(batch.section__input_ids)
    scores = np.asarray(batch.section__score)
    labels = getattr(batch, "section__relevance", None)
    labels = None if labels is None else np.asarray(labels)
    b, d = scores.shape
    s_ids = s_ids.reshape(-1, s_ids.shape[-1])
    shared_pool = s_ids.shape[0] != b * d
    rows = ["<table border='1' cellpadding='4'>",
            "<tr><th>query</th><th>rank</th><th>score</th><th>label</th><th>section</th></tr>"]
    for i in range(min(b, max_queries)):
        q_text = tokenizer.decode([t for t in q_ids[i] if t > 0], skip_special_tokens=True)
        order = np.argsort(-np.where(np.isfinite(scores[i]), scores[i], -np.inf))[:top_sections]
        for rank, j in enumerate(order):
            row = j if shared_pool else i * d + j
            text = tokenizer.decode([t for t in s_ids[row] if t > 0], skip_special_tokens=True)
            lab = "" if labels is None else f"{labels[i, j]:.0f}"
            rows.append(
                f"<tr><td>{_html.escape(q_text) if rank == 0 else ''}</td>"
                f"<td>{rank}</td><td>{scores[i, j]:+.3f}</td><td>{lab}</td>"
                f"<td>{_html.escape(text)}</td></tr>"
            )
    rows.append("</table>")
    return "\n".join(rows)
