"""Experiment runner + CLI (parity: reference `vod_exps/train.py:30` `train`
entrypoint + `run_exp:36`): config -> datasets -> device corpus -> model ->
periodic training with in-loop reindexing. `resume_from` reloads the run's
config + checkpoint (parity: `train.py:38-47`).
"""

from __future__ import annotations

import json
import os
import pathlib
import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vod_tpu.configs.dataloaders import DataLoaderConfig
from vod_tpu.dataloaders import RealmDataloader
from vod_tpu.data.corpus import tokenize_corpus
from vod_tpu.exps.structconf import Experiment, ModelConfig
from vod_tpu.models import (
    CausalLMConfig,
    MarginalLikelihoodGradients,
    Ranker,
    Realm,
    RetrievalGradients,
    TransformerEncoderConfig,
    VodGradients,
    VodPoolerConfig,
)
from vod_tpu.runtime import DeviceCorpus, TrainerState
from vod_tpu.runtime.collate import device_collate
from vod_tpu.runtime.train import make_train_step
from vod_tpu.exps.recipes import PeriodicTrainingConfig, periodic_training
from vod_tpu.search import HybridEngines, build_dense_index


def _make_distillation(cfg: ModelConfig) -> typ.Any:
    from vod_tpu.models.gradients import DistillationGradients

    return DistillationGradients(
        objective=cfg.distill_objective,
        temperature=cfg.distill_temperature,
        ce_weight=cfg.distill_ce_weight,
    )


def build_model(cfg: ModelConfig, *, proposal_temperature: float = 1.0) -> typ.Any:
    """`proposal_temperature` must equal the collate's sampling temperature —
    the VOD estimator's importance correction subtracts the same beta*s the
    priority sampler used as its proposal (models/gradients.py:233)."""
    enc_cfg = TransformerEncoderConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        remat=cfg.remat,
        lora_rank=cfg.lora_rank,
        lora_alpha=cfg.lora_alpha,
        moe_experts=cfg.moe_experts,
        moe_top_k=cfg.moe_top_k,
        moe_capacity_factor=cfg.moe_capacity_factor,
        pooler=VodPoolerConfig(
            agg_method=cfg.agg_method,
            output_norm=cfg.output_norm,
            scaler=cfg.scaler,
            learn_scaler=cfg.learn_scaler,
        ),
    )
    gradients = {
        "retrieval": lambda: RetrievalGradients(),
        "marginal_likelihood": lambda: MarginalLikelihoodGradients(),
        "vod": lambda: VodGradients(alpha=cfg.vod_alpha, proposal_temperature=proposal_temperature),
        "distillation": lambda: _make_distillation(cfg),
    }[cfg.gradients]()
    if cfg.kind == "realm":
        if cfg.splade_encoder:
            raise ValueError("splade_encoder is only supported for kind: ranker")
        if cfg.reader == "seq2seq":
            from vod_tpu.models.seq2seq import Seq2SeqRealm
            from vod_tpu.models.t5_encoder import T5EncoderConfig

            reader_cfg = T5EncoderConfig(
                vocab_size=cfg.vocab_size,
                hidden_size=cfg.lm_hidden_size,
                num_layers=cfg.lm_num_layers,
                num_heads=cfg.num_heads,
                head_dim=cfg.lm_hidden_size // cfg.num_heads,
                intermediate_size=cfg.intermediate_size,
            )
            return Seq2SeqRealm(
                cfg=enc_cfg, reader_cfg=reader_cfg, gradients=gradients,
                debug_encoder=cfg.debug_encoder,
            )
        lm_cfg = _causal_lm_config(cfg)
        return Realm(cfg=enc_cfg, lm_cfg=lm_cfg, gradients=gradients, debug_encoder=cfg.debug_encoder)
    if cfg.splade_encoder and cfg.debug_encoder:
        raise ValueError("splade_encoder and debug_encoder are mutually exclusive")
    return Ranker(
        cfg=enc_cfg,
        gradients=gradients,
        debug_encoder=cfg.debug_encoder,
        splade_encoder=cfg.splade_encoder,
        splade_flops_weight=cfg.splade_flops_weight,
    )


def _causal_lm_config(cfg: ModelConfig) -> CausalLMConfig:
    """Reader config: from the pretrained checkpoint when `lm_name_or_path`
    is set (parity: hydra `model/lm/pygmalion-350m.yaml` — hub LM dims win),
    else from the ModelConfig knobs."""
    if cfg.lm_name_or_path is not None:
        try:
            import transformers

            from vod_tpu.models.lm import gpt2_config_from_hf

            hf_cfg = transformers.AutoConfig.from_pretrained(cfg.lm_name_or_path)
            return gpt2_config_from_hf(hf_cfg)
        except Exception as exc:  # noqa: BLE001 - hub/cache errors surface here
            if cfg.hf_fallback != "random":
                raise
            import warnings

            warnings.warn(f"HF LM config {cfg.lm_name_or_path!r} unavailable ({exc}); config dims")
    return CausalLMConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.lm_hidden_size,
        num_layers=cfg.lm_num_layers,
        num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
    )


def _maybe_port_hf_lm(params: dict, cfg: ModelConfig) -> dict:
    """Graft a ported HF GPT-2-family reader into freshly-initialized Realm
    params (the decoder-only leg of the checkpoint-porting story; encoder
    grafting is `_maybe_port_hf_encoder` below)."""
    if cfg.lm_name_or_path is None or cfg.kind != "realm" or cfg.reader != "causal":
        return params
    try:
        from vod_tpu.models.lm import load_hf_causal_lm

        _, lm_params = load_hf_causal_lm(cfg.lm_name_or_path)
    except Exception as exc:  # noqa: BLE001
        if cfg.hf_fallback == "random":
            import warnings

            warnings.warn(f"HF port of {cfg.lm_name_or_path!r} unavailable ({exc}); random init")
            return params
        raise
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-safe copy
    params["params"]["lm"] = lm_params
    return params


def _maybe_port_hf_encoder(params: dict, cfg: ModelConfig) -> dict:
    """Graft a ported HF BERT-family backbone into freshly-initialized params
    (parity: reference hydra `model/encoder/<hub-name>.yaml` instantiates hub
    checkpoints directly). Zero-egress environments need a local HF cache;
    `hf_fallback: random` keeps the random init instead of failing."""
    if cfg.name_or_path is None or cfg.debug_encoder:
        return params
    try:
        from vod_tpu.models.hf_import import load_hf_encoder

        hf_cfg, backbone = load_hf_encoder(cfg.name_or_path)
    except Exception as exc:  # noqa: BLE001 - hub/cache errors surface here
        if cfg.hf_fallback == "random":
            import warnings

            warnings.warn(f"HF port of {cfg.name_or_path!r} unavailable ({exc}); random init")
            return params
        raise
    if (hf_cfg.hidden_size, hf_cfg.num_layers) != (cfg.hidden_size, cfg.num_layers):
        raise ValueError(
            f"config mismatch vs checkpoint {cfg.name_or_path!r}: "
            f"hidden={hf_cfg.hidden_size} layers={hf_cfg.num_layers}"
        )
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-safe copy
    params["params"]["encoder"]["backbone"] = backbone
    return params


def _decay_mask(params: typ.Any) -> typ.Any:
    """HF-style weight-decay grouping (parity: reference `get_optimizer:88-113`):
    biases and norm scales are excluded from decay; only matrix kernels and
    embeddings decay."""

    def keep(path: tuple, leaf: typ.Any) -> bool:
        name = jax.tree_util.keystr(path).lower()
        if any(t in name for t in ("bias", "norm", "scale", "ln_", "'ln", "layernorm")):
            return False
        return getattr(leaf, "ndim", 0) >= 2

    return jax.tree_util.tree_map_with_path(keep, params)


def run_experiment(
    exp: Experiment,
    *,
    sections: typ.Optional[typ.Sequence[typ.Mapping]] = None,
    queries: typ.Optional[typ.Sequence[typ.Mapping]] = None,
    val_queries: typ.Optional[typ.Sequence[typ.Mapping]] = None,
    tokenizer: typ.Optional[typ.Any] = None,
    on_log: typ.Optional[typ.Callable[[int, dict], None]] = None,
    resume_from: typ.Optional[str] = None,
) -> dict[str, typ.Any]:
    """Run the full periodic-training recipe.

    Datasets/tokenizer may be passed directly (tests, notebooks) or are loaded
    from the config (HF hub paths). `resume_from` restores params / optimizer /
    trainer state from a run dir or one of its `period-*` checkpoints (parity:
    reference `vod_exps/train.py:38-47`).
    """
    rng = jax.random.PRNGKey(exp.sys.seed)
    tokenizer = tokenizer if tokenizer is not None else exp.tokenizer.instantiate()

    # --- device mesh from SysConfig (parity: hydra fabric/strategy groups) ---
    # Built whenever the config names a non-trivial layout; `dense.sharded`
    # rebuilds shard over `shard_axis`, and batches dp-shard over a "dp" axis.
    mesh = None
    dp_axis = None
    if list(exp.sys.mesh_shape) != [1] and len(jax.devices()) > 1:
        from vod_tpu.parallel import make_mesh

        mesh = make_mesh(tuple(exp.sys.mesh_shape), tuple(exp.sys.mesh_axes))
        dp_axis = "dp" if "dp" in mesh.axis_names else None
        if exp.search_defaults.dense.sharded and exp.search_defaults.dense.shard_axis not in mesh.axis_names:
            raise ValueError(
                f"dense.sharded requires axis {exp.search_defaults.dense.shard_axis!r} "
                f"in sys.mesh_axes {list(mesh.axis_names)}"
            )

    # --- effective-batch accounting (parity: the reference's accumulation
    # resolver `resolvers.py:111` + the `hydra/patch/arch/*` batch_size
    # blocks): when `trainer.batch_size` is set explicitly, `per_device`
    # drives the dataloader and accumulate_grad_batches is inferred as
    # ceil(effective / (per_device * dp_degree)) unless pinned by hand ---
    dl_config = exp.dataloader
    accumulate = exp.trainer.accumulate_grad_batches
    bs = exp.trainer.batch_size
    if bs.model_fields_set:
        if "per_device" in bs.model_fields_set and bs.per_device != dl_config.batch_size:
            dl_config = dl_config.model_copy(update={"batch_size": bs.per_device})
        n_dp = mesh.shape[dp_axis] if (mesh is not None and dp_axis is not None) else 1
        if accumulate == 1:
            accumulate = max(1, -(-bs.effective // (n_dp * dl_config.batch_size)))

    if sections is None or queries is None:
        from vod_tpu.data.interface import load_queries, load_sections
        from vod_tpu.data.postprocessing import combine_datasets

        sections = combine_datasets([load_sections(c) for c in exp.datasets.sections])
        queries = combine_datasets([load_queries(c) for c in exp.datasets.queries])

    # --- corpus -> device ---------------------------------------------------
    sparse_cfg = exp.search_defaults.sparse
    enc = tokenize_corpus(
        list(sections),
        tokenizer,
        max_length=exp.tokenizer.max_length,
        templates=exp.templates,
        with_sparse_terms=True,
        sparse_language=sparse_cfg.language,
        sparse_stem=sparse_cfg.stem,
    )
    corpus = DeviceCorpus(
        input_ids=jnp.asarray(enc["input_ids"]),
        attention_mask=jnp.asarray(enc["attention_mask"]),
        subset_ids=jnp.asarray(enc["subset_ids"]),
    )
    # route the O(tokens) C++ postings builder (python fallback inside), same
    # as the factory path — the pure-Python build is hours-slow at MSMARCO scale
    from vod_tpu.search.factory import build_sparse_from_config

    sparse_engine = build_sparse_from_config(
        sparse_cfg,
        [enc["terms"][i, : enc["term_counts"][i]].tolist() for i in range(len(sections))],
        n_terms=1 << 18,
        mesh=mesh if (sparse_cfg.sharded and mesh is not None
                      and sparse_cfg.shard_axis in mesh.axis_names) else None,
        shard_axis=sparse_cfg.shard_axis,
    )

    # --- dataloaders ---------------------------------------------------------
    with_lm = exp.model.kind == "realm"
    train_dl = RealmDataloader(
        list(queries),
        tokenizer,
        config=dl_config,
        templates=exp.templates,
        id_map=enc["id_map"],
        subset_id_map=enc["subset_id_map"],
        max_length=exp.tokenizer.max_length,
        with_answers=with_lm,
        with_sparse_terms=True,
        sparse_language=sparse_cfg.language,
        sparse_stem=sparse_cfg.stem,
    )
    val_dl_batches = None
    if val_queries is not None:
        val_dl = RealmDataloader(
            list(val_queries), tokenizer,
            config=DataLoaderConfig(batch_size=exp.dataloader.batch_size, shuffle=False),
            templates=exp.templates, id_map=enc["id_map"], subset_id_map=enc["subset_id_map"],
            max_length=exp.tokenizer.max_length, with_answers=with_lm, with_sparse_terms=True,
            sparse_language=sparse_cfg.language, sparse_stem=sparse_cfg.stem,
        )
        val_dl_batches = list(val_dl.epoch(seed=0))

    # --- model + optimizer ----------------------------------------------------
    model = build_model(exp.model, proposal_temperature=exp.collate.temperature)
    lr: typ.Any = exp.trainer.learning_rate
    if exp.trainer.lr_schedule is not None:
        lr = exp.trainer.lr_schedule.instantiate(exp.trainer.learning_rate, exp.trainer.max_steps)
    wd = exp.trainer.weight_decay
    tx = {
        "adamw": lambda: optax.adamw(lr, weight_decay=wd, mask=_decay_mask),
        "adafactor": lambda: optax.adafactor(lr, weight_decay_rate=wd or None),
        "sgd": lambda: optax.chain(
            optax.add_decayed_weights(wd, mask=_decay_mask), optax.sgd(lr)
        ) if wd else optax.sgd(lr),
    }[exp.trainer.optimizer]()
    step_fn = make_train_step(
        model, tx,
        prefetch=exp.collate.prefetch_n_sections,
        n_sections=exp.collate.n_sections or 8,
        max_pos_sections=exp.collate.max_pos_sections or 2,
        temperature=exp.collate.temperature,
        max_support_size=exp.collate.support_size,
        with_lm=with_lm,
        gradient_clip_val=exp.trainer.gradient_clip_val,
        in_batch_negatives=exp.collate.in_batch_negatives,
        accumulate_grad_batches=accumulate,
        splade_query_k=exp.model.splade_query_k if exp.model.splade_encoder else None,
        gradcache_chunk_rows=exp.trainer.gradcache_chunk_rows,
    )

    # init params with a first collated batch
    init_batch_q = next(iter(train_dl.epoch(seed=exp.sys.seed)))
    dummy_emb = jnp.zeros((corpus.size, model.cfg.hidden_size), dtype=jnp.float32)
    engines0 = HybridEngines(dense=build_dense_index(dummy_emb, dtype="float32"), sparse=sparse_engine)
    rng, init_rng = jax.random.split(rng)
    init_batch, _ = device_collate(
        init_rng, engines0, corpus, init_batch_q,
        query_vectors=jnp.zeros((init_batch_q.input_ids.shape[0], model.cfg.hidden_size)),
        prefetch=exp.collate.prefetch_n_sections,
        n_sections=exp.collate.n_sections or 8,
        max_pos_sections=exp.collate.max_pos_sections or 2,
        with_lm=with_lm,
        in_batch_negatives=exp.collate.in_batch_negatives,
    )
    params = model.init(jax.random.PRNGKey(exp.sys.seed), init_batch, mode="evaluate")
    params = _maybe_port_hf_encoder(params, exp.model)
    params = _maybe_port_hf_lm(params, exp.model)
    if exp.model.kbit:
        # QLoRA-style: int8-freeze the base, optimize LoRA/pooler only
        if exp.model.lora_rank <= 0:
            raise ValueError("model.kbit requires model.lora_rank > 0 (nothing to train)")
        from vod_tpu.models import kbit_prepare
        from vod_tpu.models.encoder import lora_trainable_mask

        params = kbit_prepare(params, lora_trainable_mask(params))
        opt_state = tx.init(params.trainable)
    else:
        opt_state = tx.init(params)

    state = TrainerState(
        max_steps=exp.trainer.max_steps,
        period=exp.trainer.period,
        accumulate_grad_batches=accumulate,
        parameters={k: s.instantiate() for k, s in exp.trainer.parameters.items()},
    )

    if resume_from is not None:
        from vod_tpu.runtime.checkpoint import load_checkpoint

        ckpt = _latest_checkpoint_dir(resume_from)
        params, opt_state, loaded = load_checkpoint(
            ckpt, params_like=params, opt_state_like=opt_state
        )
        # progress counters come from the checkpoint; the step budget,
        # period length and schedules come from the (possibly updated) config
        state.step = loaded.step
        state.epoch = loaded.epoch
        state.update_steps = loaded.update_steps

    if exp.trainer.checkpoint_path:
        # persist the config alongside checkpoints so `--resume_from <dir>`
        # can reload it (parity: reference resume-from-dir config reload)
        cfg_dir = pathlib.Path(exp.trainer.checkpoint_path)
        cfg_dir.mkdir(parents=True, exist_ok=True)
        (cfg_dir / "config.json").write_text(exp.model_dump_json(indent=2))

    def train_queries_fn(pidx: int):
        return train_dl.forever(seed=exp.sys.seed + 7919 * pidx)

    rng, loop_rng = jax.random.split(rng)
    params, opt_state, state, history = periodic_training(
        model=model,
        step_fn=step_fn,
        params=params,
        opt_state=opt_state,
        corpus=corpus,
        state=state,
        train_queries_fn=train_queries_fn,
        rng=loop_rng,
        sparse_engine=sparse_engine,
        val_queries=val_dl_batches,
        config=PeriodicTrainingConfig(
            # splade: the learned impact index replaces the dense engine and is
            # rebuilt from the current encoder at every period boundary
            dense=None if exp.model.splade_encoder else exp.search_defaults.dense,
            splade_doc_k=exp.model.splade_doc_k if exp.model.splade_encoder else None,
            splade_max_postings=exp.model.splade_max_postings,
            splade_query_k=exp.model.splade_query_k,
            mesh=mesh,
            dp_axis=dp_axis,
            checkpoint_dir=exp.trainer.checkpoint_path,
            log_interval=exp.trainer.log_interval,
            val_check_interval=exp.trainer.val_check_interval,
            metrics=tuple(exp.trainer.metrics),
            profile_dir=exp.sys.profile_dir,
        ),
        on_log=on_log,
    )
    return {"params": params, "opt_state": opt_state, "state": state, "history": history, "model": model}


def _latest_checkpoint_dir(resume_from: str) -> pathlib.Path:
    """Resolve a run dir to its newest `period-*` checkpoint (or itself)."""
    root = pathlib.Path(resume_from)
    if (root / "trainer_state.json").exists():
        return root
    periods = sorted(
        (p for p in root.glob("period-*") if (p / "trainer_state.json").exists()),
        key=lambda p: int(p.name.split("-")[1]),
    )
    if not periods:
        raise FileNotFoundError(f"no checkpoint under {resume_from!r}")
    return periods[-1]


def main(argv: typ.Optional[list[str]] = None) -> None:
    """CLI: `python -m vod_tpu.exps.cli --config exp.yaml [--max_steps N]
    [--resume_from RUN_DIR]` (parity: reference `train.py:30` + resume `:38-47`)."""
    import argparse

    parser = argparse.ArgumentParser(description="vod-tpu training")
    parser.add_argument("--config", default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument(
        "--resume_from", default=None,
        help="run/checkpoint dir; reloads its config.json unless --config overrides",
    )
    # multi-process (multi-host) launch (parity: Fabric launchers,
    # `vod_exps/init.py:40-85`): every process runs this same entrypoint with
    # its own --process_id; jax.devices() then spans all hosts, so configured
    # meshes stretch over the pod automatically. Env-var equivalents:
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    parser.add_argument("--coordinator", default=None, help="host:port of process 0")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args(argv)
    if (
        args.coordinator
        or args.num_processes
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("JAX_NUM_PROCESSES")
    ):
        from vod_tpu.parallel import init_distributed

        pi, pc = init_distributed(args.coordinator, args.num_processes, args.process_id)
        print(f"[process {pi}/{pc}] joined; {len(__import__('jax').devices())} global devices")
    if args.config is not None:
        exp = Experiment.from_file(args.config)
    elif args.resume_from and (pathlib.Path(args.resume_from) / "config.json").exists():
        exp = Experiment.from_file(str(pathlib.Path(args.resume_from) / "config.json"))
    else:
        parser.error("--config is required (no config.json found to resume from)")
    if args.max_steps is not None:
        exp = Experiment.model_validate(
            {**json.loads(exp.model_dump_json()), "trainer": {**exp.trainer.model_dump(), "max_steps": args.max_steps}}
        )
    result = run_experiment(
        exp, on_log=lambda s, m: print(f"[{s}] {m}"), resume_from=args.resume_from
    )
    print(f"done: {result['state'].step} steps")


if __name__ == "__main__":
    main()
