"""Metric logging: CSV / JSONL sinks + nested-metric flattening.

Parity: reference Fabric loggers (`hydra/fabric/loggers/` csv + wandb) and the
metric fan-out in `vod_ops/utils/logging.py` / `loops/train.py:119-140`
(`fabric.log_dict` of flattened nested metrics). W&B has no offline seat here;
the JSONL sink is the machine-readable equivalent.
"""

from __future__ import annotations

import csv
import json
import pathlib
import typing as typ


def flatten_metrics(metrics: typ.Mapping[str, typ.Any], prefix: str = "") -> dict[str, float]:
    """Flatten nested dicts to `a/b/c` keys, keeping numeric leaves."""
    out: dict[str, float] = {}
    for k, v in metrics.items():
        key = f"{prefix}{k}"
        if isinstance(v, typ.Mapping):
            out.update(flatten_metrics(v, prefix=f"{key}/"))
        else:
            try:
                out[key] = float(v)
            except (TypeError, ValueError):
                continue
    return out


class JSONLLogger:
    def __init__(self, path: str | pathlib.Path):
        self.path = pathlib.Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, step: int, metrics: typ.Mapping[str, typ.Any]) -> None:
        rec = {"step": step, **flatten_metrics(metrics)}
        with self.path.open("a") as f:
            f.write(json.dumps(rec) + "\n")


class CSVLogger:
    """Append-only CSV with a growing header (rewrites on new columns)."""

    def __init__(self, path: str | pathlib.Path):
        self.path = pathlib.Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fields: list[str] = []
        self._rows: list[dict] = []

    def log(self, step: int, metrics: typ.Mapping[str, typ.Any]) -> None:
        rec = {"step": step, **flatten_metrics(metrics)}
        for k in rec:
            if k not in self._fields:
                self._fields.append(k)
        self._rows.append(rec)
        with self.path.open("w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fields)
            writer.writeheader()
            writer.writerows(self._rows)


class MultiLogger:
    def __init__(self, *loggers: typ.Any):
        self.loggers = loggers

    def log(self, step: int, metrics: typ.Mapping[str, typ.Any]) -> None:
        for lg in self.loggers:
            lg.log(step, metrics)

    def __call__(self, step: int, metrics: typ.Mapping[str, typ.Any]) -> None:
        self.log(step, metrics)
