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


def human_format_nb(num: float, precision: int = 2, base: float = 1000.0) -> str:
    """1234567 -> '1.23M' (parity: `pretty/format.py:21`)."""
    magnitude = 0
    num = float(num)
    while abs(num) >= base and magnitude < 6:
        magnitude += 1
        num /= base
    return f"{num:.{precision}f}{['', 'K', 'M', 'B', 'T', 'P', 'E'][magnitude]}"


def human_format_bytes(x: int, unit: str = "MB") -> str:
    """Bytes -> '12.3 MB' (parity: `pretty/format.py:11`)."""
    divisor = {"B": 1, "KB": 1 << 10, "MB": 1 << 20, "GB": 1 << 30, "TB": 1 << 40}[unit]
    return f"{x / divisor:.2f} {unit}"


def repr_array(x: typ.Any) -> str:
    """One-line shape/dtype/device summary of an array (parity: `repr_tensor`)."""
    dev = ""
    if hasattr(x, "devices"):
        try:
            dev = f" @{next(iter(x.devices())).platform}"
        except Exception:
            dev = ""
    return f"{type(x).__name__}[{', '.join(map(str, x.shape))}] {x.dtype}{dev}"


def _properties(v: typ.Any) -> tuple[str, str]:
    """(shape/dtype, stats) columns for one batch field (parity: the
    reference's `infer_properties` table — shape, dtype, device, min/mean/max,
    nan count; `print_batch.py:61`)."""
    if hasattr(v, "shape") and hasattr(v, "dtype"):
        arr = np.asarray(v)
        stats = ""
        if arr.size and np.issubdtype(arr.dtype, np.number):
            f = arr.astype(np.float64, copy=False)
            finite = np.isfinite(f)
            n_bad = int(arr.size - finite.sum())
            if finite.any():
                ff = f[finite]
                stats = f"min={ff.min():.3g} mean={ff.mean():.3g} max={ff.max():.3g}"
            if n_bad:
                stats += f" ({n_bad} non-finite)"
        return f"{tuple(v.shape)} {v.dtype}", stats
    if isinstance(v, (list, tuple, set)):
        return f"{type(v).__name__}[{len(v)}]", ""
    return type(v).__name__, str(v)[:40] if isinstance(v, (int, float, str, bool)) else ""


def pprint_batch(batch: typ.Any, header: str = "batch", stats: bool = True) -> None:
    """Tabulate a batch's fields with shapes/dtypes (+min/mean/max/non-finite
    when `stats`; parity: `pprint_batch`, `print_batch.py:246`)."""
    items: list[tuple[str, str, str]] = []
    source = batch.__dict__ if hasattr(batch, "__dict__") else dict(batch)
    for k, v in source.items():
        if v is None or k in ("extras", "diagnostics"):
            continue
        sd, st = _properties(v)
        items.append((k, sd, st if stats else ""))
    console = _console()
    if console is not None:
        import rich.table

        table = rich.table.Table(title=header)
        table.add_column("field")
        table.add_column("shape / dtype")
        if stats:
            table.add_column("stats")
        for row in items:
            table.add_row(*(row if stats else row[:2]))
        console.print(table)
    else:
        print(f"== {header} ==")
        for k, sd, st in items:
            print(f"  {k:28s} {sd:24s} {st}")


def pprint_config(
    config: typ.Any,
    header: str = "config",
    exclude: typ.Sequence[str] = ("api_key", "token", "password"),
) -> None:
    """Pretty-print a pydantic/dataclass/dict config tree, pruning secret keys
    (parity: `pretty/print_config.py:17`)."""
    if hasattr(config, "model_dump"):
        data = config.model_dump()
    elif hasattr(config, "__dict__") and not isinstance(config, dict):
        data = dict(config.__dict__)
    else:
        data = dict(config)

    def _prune(x: typ.Any) -> typ.Any:
        if isinstance(x, dict):
            return {k: _prune(v) for k, v in x.items() if not any(e in k.lower() for e in exclude)}
        if isinstance(x, (list, tuple)):
            return [_prune(v) for v in x]
        return x

    data = _prune(data)
    console = _console()
    try:
        import yaml

        text = yaml.safe_dump(data, sort_keys=False, default_flow_style=False)
    except Exception:
        import json

        text = json.dumps(data, indent=2, default=str)
    if console is not None:
        import rich.panel
        import rich.syntax

        console.print(rich.panel.Panel(rich.syntax.Syntax(text, "yaml"), title=header))
    else:
        print(f"== {header} ==\n{text}")


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
