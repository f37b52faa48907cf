"""The master recipe: periodic training with in-loop reindexing.

Parity: reference `vod_exps/recipes/periodic_training.py:21` — while not
completed: (benchmarks between periods) -> re-embed the corpus with the current
encoder -> rebuild the search index -> train one period with live retrieval ->
checkpoint. The reference restarts search-server processes and rebuilds faiss
files on disk each period (`_compute_all_vectors:99`, `spawn_search_and_train`);
here re-embedding is a jitted chunked forward and the index rebuild is an
on-device array swap — in-loop reindexing becomes cheap (SURVEY §7 step 7).
"""

from __future__ import annotations

import dataclasses
import pathlib
import time
import typing as typ

import jax
import numpy as np

from vod_tpu.runtime.benchmark import benchmark_retrieval
from vod_tpu.runtime.checkpoint import save_checkpoint
from vod_tpu.runtime.collate import DeviceCorpus, QueryBatch
from vod_tpu.runtime.predict import compute_embeddings
from vod_tpu.runtime.state import TrainerState
from vod_tpu.configs.search import DenseFactoryConfig
from vod_tpu.runtime.train import RealmTrainStep, training_loop
from vod_tpu.search.factory import build_dense_from_config
from vod_tpu.search.hybrid import HybridEngines


@dataclasses.dataclass
class PeriodicTrainingConfig:
    embed_chunk: int = 512
    # When the full [N, H] f32 embedding matrix would exceed this budget, the
    # re-embed streams host slabs through the encoder and the index is built
    # with `build_dense_from_host` — only compressed codes land in HBM
    # (VERDICT r2 #2: 8.8M x 768 f32 = 27GB > 16GB v5e; parity: the reference
    # predict loop streams to tensorstore, `predict/compute.py:119`).
    embed_hbm_budget_bytes: int = 8 << 30
    # Full dense-index factory config — the periodic rebuild honors EVERY codec
    # (flat/int8/pq/ivf, OPQ, sharded), not just flat (parity: the reference
    # rebuilds whatever faiss factory string the config names, `factory.py:131`).
    # None disables the dense engine (learned-sparse-only training).
    dense: typ.Optional[DenseFactoryConfig] = dataclasses.field(default_factory=DenseFactoryConfig)
    # SPLADE periodic reindexing (beyond reference): when set, each period
    # boundary re-encodes the corpus to top-`splade_doc_k` learned term impacts
    # (`models.splade.encode_corpus_terms` — the [N, V] matrix never
    # materializes) and rebuilds the impact postings as the SPARSE engine;
    # pair with `RealmTrainStep(splade_query_k=...)` for live query terms.
    splade_doc_k: typ.Optional[int] = None
    splade_max_postings: int = 4096
    splade_query_k: int = 64  # benchmark-time query sparsification width
    mesh: typ.Any = None  # device mesh for `dense.sharded` rebuilds + dp training
    dp_axis: typ.Optional[str] = None  # mesh axis to dp-shard training batches over
    checkpoint_dir: typ.Optional[str] = None
    benchmark_on_init: bool = False
    benchmark_between_periods: bool = False
    log_interval: int = 50
    val_check_interval: typ.Optional[int] = None
    metrics: tuple[str, ...] = ("mrr", "ndcg_10", "hitrate_3")
    # jax.profiler trace dir (first period only; TensorBoard/Perfetto viewable)
    profile_dir: typ.Optional[str] = None


def periodic_training(
    *,
    model: typ.Any,
    step_fn: RealmTrainStep,
    params: typ.Any,
    opt_state: typ.Any,
    corpus: DeviceCorpus,
    state: TrainerState,
    train_queries_fn: typ.Callable[[int], typ.Iterable[QueryBatch]],
    rng: jax.Array,
    sparse_engine: typ.Any = None,
    val_queries: typ.Optional[typ.Sequence[QueryBatch]] = None,
    benchmark_queries: typ.Optional[typ.Sequence[QueryBatch]] = None,
    config: typ.Optional[PeriodicTrainingConfig] = None,
    on_log: typ.Optional[typ.Callable[[int, dict], None]] = None,
) -> tuple[typ.Any, typ.Any, TrainerState, list[dict]]:
    """Train until `state.completed`, re-embedding + rebuilding the dense index
    at every period boundary. `train_queries_fn(pidx)` yields that period's
    query batches. Returns (params, opt_state, state, per-period summaries).
    """
    cfg = config or PeriodicTrainingConfig()
    history: list[dict] = []

    from vod_tpu.models.kbit import full_params

    encode = lambda p, i, m: model.apply(full_params(p), i, m, method=type(model).encode_field)

    while not state.completed:
        pidx = state.pidx
        t0 = time.time()

        # 1. re-embed the corpus with the CURRENT encoder + rebuild the index
        #    (parity: `_compute_all_vectors` + `build_hybrid_search_engine`) —
        #    through the factory, so PQ/OPQ/IVF/sharded configs actually train
        #    against the index codec they name.
        rng, build_rng = jax.random.split(rng)
        tune_info: typ.Optional[dict] = None
        if cfg.splade_doc_k is not None:
            # learned-sparse reindex: the sparse engine is rebuilt from the
            # CURRENT encoder's document impacts (the SPLADE analogue of the
            # dense re-embed; parity: `_compute_all_vectors` + index rebuild)
            from vod_tpu.models.splade import encode_corpus_terms
            from vod_tpu.search.sparse import build_impact_index

            terms, weights = encode_corpus_terms(
                encode, params, corpus.input_ids, corpus.attention_mask,
                k=cfg.splade_doc_k, chunk=cfg.embed_chunk,
            )
            probe = encode(params, corpus.input_ids[:1], corpus.attention_mask[:1])
            learned_sparse = build_impact_index(
                terms, weights,
                n_terms=int(probe.shape[-1]),
                max_postings=cfg.splade_max_postings,
                subset_ids=None if corpus.subset_ids is None else np.asarray(corpus.subset_ids),
            )
            engines = HybridEngines(dense=None, sparse=learned_sparse)
        elif cfg.dense is None:
            engines = HybridEngines(dense=None, sparse=sparse_engine)
        else:
            probe = encode(params, corpus.input_ids[:1], corpus.attention_mask[:1])
            est_bytes = corpus.size * int(probe.shape[-1]) * 4
            if est_bytes > cfg.embed_hbm_budget_bytes and cfg.dense.codec in ("pq", "int8", "ivfpq"):
                # scale path: stream embeddings to host RAM, build compressed codes
                from vod_tpu.runtime.predict import compute_embeddings_to_host
                from vod_tpu.search.factory import build_dense_from_host

                emb_src: typ.Any = compute_embeddings_to_host(
                    encode, params,
                    np.asarray(corpus.input_ids), np.asarray(corpus.attention_mask),
                    chunk=cfg.embed_chunk,
                )
                dense = build_dense_from_host(
                    cfg.dense, emb_src, rng=build_rng,
                    subset_ids=corpus.subset_ids, mesh=cfg.mesh,
                )
            else:
                emb_src = compute_embeddings(encode, params, corpus, chunk=cfg.embed_chunk)
                dense = build_dense_from_config(
                    cfg.dense, emb_src, rng=build_rng, subset_ids=corpus.subset_ids, mesh=cfg.mesh,
                )
            if cfg.dense.autotune_target_recall is not None:
                # close the faiss-ParameterSpace loop each period: the knobs
                # (nprobe/k_factor/n_candidates) are re-tuned against the
                # CURRENT encoder's embedding geometry, not pinned in config
                from vod_tpu.search.autotune import autotune_after_build

                rng, tune_rng = jax.random.split(rng)
                dense, tune_info = autotune_after_build(
                    dense, cfg.dense, emb_src, rng=tune_rng
                )
            del emb_src
            engines = HybridEngines(dense=dense, sparse=sparse_engine)
        embed_s = time.time() - t0

        summary: dict[str, typ.Any] = {"period": pidx, "embed_s": round(embed_s, 3)}
        if tune_info is not None:
            summary["autotune"] = tune_info

        # 2. optional between-period benchmark (parity: `_run_benchmarks`)
        if benchmark_queries is not None and (
            cfg.benchmark_between_periods or (pidx == 0 and cfg.benchmark_on_init)
        ):
            if cfg.splade_doc_k is not None:
                # learned-sparse queries: impacts -> top-k (terms, weights)
                from vod_tpu.models.splade import splade_topk_terms

                bq = []
                for qb in benchmark_queries:
                    imp = encode(params, qb.input_ids, qb.attention_mask)
                    tq, wq = splade_topk_terms(imp, cfg.splade_query_k)
                    bq.append(qb.replace(terms=tq, term_weights=wq))
                summary["benchmark"] = benchmark_retrieval(engines, bq, metrics=cfg.metrics)
            else:
                q_vecs = [
                    encode(params, qb.input_ids, qb.attention_mask) for qb in benchmark_queries
                ]
                summary["benchmark"] = benchmark_retrieval(
                    engines, benchmark_queries, query_vectors=q_vecs, metrics=cfg.metrics,
                )

        # 3. train for one period with live retrieval
        rng, loop_rng = jax.random.split(rng)
        params, opt_state, state, last = training_loop(
            step_fn=step_fn,
            params=params,
            opt_state=opt_state,
            engines=engines,
            corpus=corpus,
            train_queries=train_queries_fn(pidx),
            state=state,
            rng=loop_rng,
            val_queries=val_queries,
            val_check_interval=cfg.val_check_interval,
            log_interval=cfg.log_interval,
            metrics=cfg.metrics,
            on_log=on_log,
            mesh=cfg.mesh if cfg.dp_axis else None,
            dp_axis=cfg.dp_axis or "dp",
            profile_dir=cfg.profile_dir if pidx == 0 else None,
        )
        summary["train"] = last
        summary["period_s"] = round(time.time() - t0, 3)
        history.append(summary)

        # 4. checkpoint at the period boundary (parity: `utils/io.py:15`)
        if cfg.checkpoint_dir:
            save_checkpoint(
                pathlib.Path(cfg.checkpoint_dir) / f"period-{pidx}",
                params=params, opt_state=opt_state, state=state,
            )
        if state.step >= state.max_steps:
            break
    return params, opt_state, state, history
