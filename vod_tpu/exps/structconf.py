"""Structured experiment config: dict/YAML -> validated Experiment.

Parity: reference `vod_exps/structconf/` — `Experiment:43` (main.py), dataset-list
parsing with defaults/diff merging (`parsing.py:71,219`), `__vars__` combinatorial
config expansion (`utils.py:14`), and link validation with orphan-section dropping
(`datasets.py:26-53`). The reference parses a hydra/omegaconf tree; here plain
dicts (from YAML/JSON/CLI) go straight into pydantic.
"""

from __future__ import annotations

import copy
import itertools
import re
import typing as typ

import pydantic

from vod_tpu.configs import (
    DataLoaderConfig,
    QueriesDatasetConfig,
    RealmCollateConfig,
    SearchFactoryDefaults,
    SectionsDatasetConfig,
    StrictModel,
    SysConfig,
    TemplatesConfig,
    TokenizerConfig,
    TrainerConfig,
)

_VARS_KEY = "__vars__"


def expand_vars(configs: typ.Sequence[typ.Mapping[str, typ.Any]]) -> list[dict[str, typ.Any]]:
    """Expand `__vars__` product placeholders (parity: `structconf/utils.py:14`).

    [{"name": "{lang}-ds", "__vars__": {"lang": ["en", "fr"]}}] ->
    [{"name": "en-ds"}, {"name": "fr-ds"}]
    """
    out: list[dict] = []
    for cfg in configs:
        if not isinstance(cfg, dict) or _VARS_KEY not in cfg:
            out.append(dict(cfg) if isinstance(cfg, dict) else cfg)
            continue
        cfg = dict(cfg)
        variables = cfg.pop(_VARS_KEY)

        def _sub(v: typ.Any, target: str, value: typ.Any) -> typ.Any:
            if isinstance(v, str):
                return re.sub(rf"\{{\s*{target}\s*\}}", str(value), v)
            if isinstance(v, dict):
                return {k: _sub(x, target, value) for k, x in v.items()}
            if isinstance(v, list):
                return [_sub(x, target, value) for x in v]
            return v

        keys = list(variables.keys())
        for combo in itertools.product(*variables.values()):
            new = copy.deepcopy(cfg)
            for key, val in zip(keys, combo):
                new = {k: _sub(v, key, val) for k, v in new.items()}
            out.append(new)
    return out


class ModelConfig(StrictModel):
    """Flagship-model knobs (encoder + optional reader)."""

    kind: typ.Literal["ranker", "realm"] = "ranker"
    gradients: typ.Literal["retrieval", "marginal_likelihood", "vod", "distillation"] = "retrieval"
    vod_alpha: float = 0.0
    # cross-encoder -> dual-encoder distillation (gradients: distillation);
    # the batch must carry `section__teacher_score` (beyond reference)
    distill_objective: typ.Literal["margin_mse", "kl"] = "margin_mse"
    distill_temperature: float = 1.0
    distill_ce_weight: float = 0.0
    vocab_size: int = 30522
    hidden_size: int = 256
    num_layers: int = 4
    num_heads: int = 4
    intermediate_size: int = 1024
    agg_method: str = "mean"
    output_norm: typ.Optional[str] = "l2"
    scaler: float = 10.0
    learn_scaler: bool = True
    lm_hidden_size: int = 256
    lm_num_layers: int = 4
    debug_encoder: bool = False  # embedding-only encoder (parity: model/encoder=debug)
    # learned-sparse (SPLADE) encoder for `kind: ranker` — encodings are
    # vocab-impact vectors served by the device sparse engine (beyond reference)
    splade_encoder: bool = False
    splade_flops_weight: float = 0.0
    splade_query_k: int = 64  # live query-term sparsification width
    splade_doc_k: int = 128  # per-document learned-impact terms (reindexing)
    splade_max_postings: int = 4096
    # HF checkpoint porting (parity: hydra `model/encoder/e5-small.yaml` etc. —
    # the reference instantiates hub checkpoints; here the tensors are ported
    # into the native flax encoder at init)
    name_or_path: typ.Optional[str] = None
    hf_fallback: typ.Literal["error", "random"] = "error"  # cache miss behavior
    # reader family for `kind: realm` (parity: hydra `model/lm/` group)
    reader: typ.Literal["causal", "seq2seq"] = "causal"
    # pretrained decoder-only reader (parity: `model/lm/pygmalion-350m.yaml` —
    # the reference instantiates hub LMs directly into Realm); GPT-2 layout,
    # tensors ported at init; lm dims then come from the checkpoint config.
    # Cache misses obey `hf_fallback` like the encoder port.
    lm_name_or_path: typ.Optional[str] = None
    # tweaks (parity: hydra `model/tweaks/` — checkpointing.yaml / qlora.yaml)
    remat: bool = False
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # kbit (QLoRA-style): freeze + int8-quantize the base, train LoRA/pooler
    # only (requires lora_rank > 0); parity: reference `support.py:23`
    kbit: bool = False
    # MoE encoder (beyond reference): >0 replaces each FFN with a top-k routed
    # mixture of experts; expert weights shard over an `ep` mesh axis
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25


class DatasetsConfig(StrictModel):
    """Query + section shard lists with `__vars__` expansion + link validation."""

    queries: list[QueriesDatasetConfig] = pydantic.Field(default_factory=list)
    sections: list[SectionsDatasetConfig] = pydantic.Field(default_factory=list)

    @classmethod
    def parse(cls, raw: typ.Mapping[str, typ.Any]) -> "DatasetsConfig":
        queries = [QueriesDatasetConfig(**d) for d in expand_vars(raw.get("queries", []))]
        sections = [SectionsDatasetConfig(**d) for d in expand_vars(raw.get("sections", []))]
        # link validation + orphan-section dropping (parity: `datasets.py:26-53`)
        section_ids = {s.identifier for s in sections}
        for q in queries:
            if q.link is not None and q.link not in section_ids:
                raise ValueError(f"Query shard {q.identifier!r} links to unknown section shard {q.link!r}")
        linked = {q.link for q in queries if q.link is not None}
        if linked:
            sections = [s for s in sections if s.identifier in linked]
        return cls(queries=queries, sections=sections)


class Experiment(StrictModel):
    """The full experiment config (parity: `structconf/main.py:43`)."""

    model: ModelConfig = ModelConfig()
    datasets: DatasetsConfig = DatasetsConfig()
    search_defaults: SearchFactoryDefaults = SearchFactoryDefaults()
    collate: RealmCollateConfig = RealmCollateConfig()
    dataloader: DataLoaderConfig = DataLoaderConfig()
    tokenizer: TokenizerConfig = TokenizerConfig()
    templates: TemplatesConfig = TemplatesConfig()
    trainer: TrainerConfig = TrainerConfig()
    sys: SysConfig = SysConfig()

    @classmethod
    def parse(cls, raw: typ.Mapping[str, typ.Any]) -> "Experiment":
        raw = dict(raw)
        if "datasets" in raw and not isinstance(raw["datasets"], DatasetsConfig):
            raw["datasets"] = DatasetsConfig.parse(raw["datasets"])
        return cls.model_validate(raw)

    @classmethod
    def from_file(cls, path: str) -> "Experiment":
        return cls.parse(load_raw_config(path))


def deep_merge(dst: dict, src: typ.Mapping) -> dict:
    """Recursive dict merge, `src` wins (the preset composition operator)."""
    for k, v in src.items():
        if isinstance(v, typ.Mapping) and isinstance(dst.get(k), dict):
            deep_merge(dst[k], v)
        else:
            dst[k] = copy.deepcopy(v)
    return dst


def _read_raw(path: "pathlib.Path") -> dict:
    import json

    text = path.read_text()
    if path.suffix in (".yaml", ".yml"):
        import yaml

        return yaml.safe_load(text) or {}
    return json.loads(text)


def preset_root() -> "pathlib.Path":
    import pathlib

    return pathlib.Path(__file__).resolve().parents[2] / "configs" / "presets"


def load_raw_config(path: str, _seen: typ.Optional[frozenset] = None) -> dict:
    """Load a YAML/JSON config, resolving its `extends` preset composition.

    Parity: the reference's hydra `defaults:` group lists (88 yaml groups under
    `vod_exps/hydra/`). Here `extends` names fragments that deep-merge in
    order, the document's own keys winning last:

        extends: [model/realm, encoder/e5-small, search/pq, datasets/msmarco]

    Each name resolves to (1) a path relative to the current file, (2) an
    absolute path, or (3) `configs/presets/<name>.yaml`. Fragments may extend
    further fragments; cycles are an error.
    """
    import pathlib

    p = pathlib.Path(path).resolve()
    seen = _seen or frozenset()
    if str(p) in seen:
        raise ValueError(f"extends cycle through {p}")
    seen = seen | {str(p)}

    raw = _read_raw(p)
    bases = raw.pop("extends", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: dict = {}
    for name in bases:
        candidates = [
            p.parent / name,
            p.parent / f"{name}.yaml",
            pathlib.Path(name),
            preset_root() / f"{name}.yaml",
            preset_root() / name,
        ]
        frag_path = next((c for c in candidates if c.is_file()), None)
        if frag_path is None:
            raise FileNotFoundError(
                f"extends fragment {name!r} (from {p}) not found; looked in {p.parent} and {preset_root()}"
            )
        deep_merge(merged, load_raw_config(str(frag_path), seen))
    deep_merge(merged, raw)
    return merged
