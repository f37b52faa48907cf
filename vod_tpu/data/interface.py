"""Dataset loading interface.

Parity: reference `vod_datasets/interface.py:43-72` — `load_queries` /
`load_sections` / `load_dataset`: HF load (path string or loader callable) ->
rosetta transform -> postprocess (sectioning, subsampling).
"""

from __future__ import annotations

import typing as typ

from vod_tpu.configs.datasets import BaseDatasetConfig, QueriesDatasetConfig, SectionsDatasetConfig
from .rosetta.adapters import transform


def _raw_load(cfg: BaseDatasetConfig) -> typ.Any:
    src = cfg.name_or_path
    if callable(src):
        return src(subsets=cfg.subsets or None, split=cfg.split)
    import datasets as hf_datasets

    name, *rest = str(src).split(":")
    ds = hf_datasets.load_dataset(name, *(rest or []), split=cfg.split)
    return ds


def _postprocess(ds: typ.Any, cfg: BaseDatasetConfig, kind: str) -> typ.Any:
    opts = cfg.options
    if opts.subset_size is not None and len(ds) > opts.subset_size:
        ds = ds.shuffle(seed=opts.seed).select(range(opts.subset_size))
    if kind == "sections" and opts.sectioning:
        from .postprocessing import extract_sections

        ds = extract_sections(ds, opts.sectioning)
    return ds


def load_queries(cfg: QueriesDatasetConfig) -> typ.Any:
    """Load + adapt a queries shard (parity: `interface.py:43`)."""
    ds = _raw_load(cfg)
    out = transform(ds, "queries")
    if isinstance(out, tuple):  # queries-with-context got isolated
        out = out[0]
    return _postprocess(out, cfg, "queries")


def load_sections(cfg: SectionsDatasetConfig) -> typ.Any:
    """Load + adapt a sections shard (parity: `interface.py:51`)."""
    ds = _raw_load(cfg)
    out = transform(ds, "sections")
    return _postprocess(out, cfg, "sections")


def load_dataset(cfg: BaseDatasetConfig) -> typ.Any:
    """Auto-detect kind (parity: `interface.py:59`)."""
    if isinstance(cfg, QueriesDatasetConfig):
        return load_queries(cfg)
    if isinstance(cfg, SectionsDatasetConfig):
        return load_sections(cfg)
    raise TypeError(f"Unknown dataset config type: {type(cfg)}")
