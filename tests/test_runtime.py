"""Runtime tests: device collate, trainer state, the end-to-end periodic-training
slice (SURVEY §7 "minimum end-to-end slice"), checkpoints.

The end-to-end test builds a synthetic retrieval task where each query's tokens
overlap its gold section's tokens, so a trained encoder must learn to retrieve
the right sections — exercised through: embed corpus -> build index -> fused
(search+sample+collate+loss) train step -> periodic re-embed + re-index.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from vod_tpu.models import (
    Ranker,
    RetrievalGradients,
    TransformerEncoderConfig,
    VodPoolerConfig,
)
from vod_tpu.runtime import (
    DeviceCorpus,
    ParameterSchedule,
    QueryBatch,
    TrainerState,
    compute_embeddings,
    device_collate,
)
from vod_tpu.runtime.train import make_train_step
from vod_tpu.search import HybridEngines, build_dense_index, build_sparse_index


VOCAB = 64


def _make_task(rng: np.random.Generator, n_corpus=128, ls=8, lq=6):
    """Each section s is a bag of tokens from a topic; query for s shares tokens."""
    topics = rng.integers(4, VOCAB, size=(n_corpus, 3))
    sec = np.zeros((n_corpus, ls), dtype="int32")
    for i in range(n_corpus):
        sec[i] = rng.choice(topics[i], size=ls)
    corpus = DeviceCorpus(
        input_ids=jnp.asarray(sec),
        attention_mask=jnp.ones((n_corpus, ls), "int32"),
        subset_ids=jnp.asarray((np.arange(n_corpus) % 2).astype("int32")),
    )

    def make_queries(b: int, seed: int) -> QueryBatch:
        r = np.random.default_rng(seed)
        gold = r.integers(0, n_corpus, size=b)
        q = np.zeros((b, lq), dtype="int32")
        for i, g in enumerate(gold):
            q[i] = r.choice(topics[g], size=lq)
        return QueryBatch(
            input_ids=jnp.asarray(q),
            attention_mask=jnp.ones((b, lq), "int32"),
            section_ids=jnp.asarray(gold[:, None].astype("int32")),
        )

    return corpus, make_queries


def _model_and_step(with_sparse=False, n_sections=4):
    cfg = TransformerEncoderConfig(
        vocab_size=VOCAB, hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        dtype=jnp.float32,
        pooler=VodPoolerConfig(agg_method="mean", output_norm="l2", scaler=8.0, learn_scaler=True),
    )
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())
    tx = optax.adam(3e-3)
    step_fn = make_train_step(
        model, tx, prefetch=16, n_sections=n_sections, max_pos_sections=1, gradient_clip_val=1.0
    )
    return model, tx, step_fn


def test_device_collate_shapes_and_labels() -> None:
    rng = np.random.default_rng(0)
    corpus, make_queries = _make_task(rng)
    queries = make_queries(4, 1)
    emb = jnp.asarray(rng.normal(size=(corpus.size, 16)).astype("float32"))
    engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"))

    batch, sampled = jax.jit(
        lambda k, qv: device_collate(
            k, engines, corpus, queries, query_vectors=qv,
            prefetch=8, n_sections=4, max_pos_sections=2, with_lm=True,
        )
    )(jax.random.PRNGKey(0), jnp.asarray(rng.normal(size=(4, 16)).astype("float32")))

    assert batch.section__input_ids.shape == (16, 8)
    assert batch.section__score.shape == (4, 4)
    assert batch.lm__input_ids.shape[0:2] == (4, 4)
    # token_type_ids: 0=context, 1=question segments present
    tt = np.asarray(batch.lm__token_type_ids)
    assert set(np.unique(tt)) <= {0, 1, 2}
    # gold section must be present with relevance 1 (lookup guarantees it)
    rel = np.asarray(batch.section__relevance)
    idx = np.asarray(batch.section__idx)
    gold = np.asarray(queries.section_ids)[:, 0]
    for i in range(4):
        hit = [j for j in range(4) if idx[i, j] == gold[i]]
        assert hit and all(rel[i, j] == 1 for j in hit)
    # all fetched section ids are real rows (negative replaced)
    assert np.all(idx >= 0) and np.all(idx < corpus.size)


@pytest.mark.slow
def test_end_to_end_training_improves_retrieval() -> None:
    """The minimum end-to-end slice: live retrieval training must lift MRR."""
    rng = np.random.default_rng(0)
    corpus, make_queries = _make_task(rng)
    model, tx, step_fn = _model_and_step()

    init_q = make_queries(8, 0)
    emb0 = jnp.zeros((corpus.size, 32), dtype="float32")
    engines = HybridEngines(dense=build_dense_index(jnp.asarray(np.random.default_rng(1).normal(size=(corpus.size, 32)).astype("float32")), dtype="float32"))

    # init params via a collated batch
    batch, _ = device_collate(
        jax.random.PRNGKey(0), engines, corpus, init_q,
        query_vectors=jnp.zeros((8, 32)), prefetch=16, n_sections=4, max_pos_sections=1,
    )
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    opt_state = tx.init(params)

    encode = lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field)

    def retrieval_mrr(params) -> float:
        emb = compute_embeddings(encode, params, corpus, chunk=64)
        index = build_dense_index(emb, dtype="float32")
        qb = make_queries(32, 999)
        qv = encode(params, qb.input_ids, qb.attention_mask)
        from vod_tpu.search import SearchQueries
        from vod_tpu.search.dense import dense_search

        out = dense_search(index, SearchQueries(vector=qv), top_k=10)
        got = np.asarray(out.indices)
        gold = np.asarray(qb.section_ids)[:, 0]
        rr = []
        for i in range(32):
            pos = np.where(got[i] == gold[i])[0]
            rr.append(1.0 / (1 + pos[0]) if len(pos) else 0.0)
        return float(np.mean(rr))

    mrr_before = retrieval_mrr(params)

    # two periods of training with re-embedding between them
    rngk = jax.random.PRNGKey(42)
    for period in range(2):
        emb = compute_embeddings(encode, params, corpus, chunk=64)
        engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"))
        for it in range(25):
            rngk, sk = jax.random.split(rngk)
            qb = make_queries(8, 1000 * period + it)
            params, opt_state, metrics, rel, scores = step_fn.train_step(
                params, opt_state, engines, corpus, qb, sk, {"dense": 1.0}
            )
        assert np.isfinite(float(metrics["loss"]))

    mrr_after = retrieval_mrr(params)
    # the bag-of-topic-tokens task gives random init a head start (~0.7);
    # training must still add a clear margin and reach near-ceiling
    assert mrr_after > mrr_before + 0.1, (mrr_before, mrr_after)
    assert mrr_after > 0.85, mrr_after


def test_trainer_state_periods_and_schedules() -> None:
    state = TrainerState(
        max_steps=100, period=40,
        parameters={"dense": ParameterSchedule(mode="linear", start=0.0, value=1.0, period=50)},
    )
    assert state.pidx == 0
    assert state.next_period_start_step == 40
    state.step = 45
    assert state.pidx == 1
    assert state.next_period_start_step == 80
    state.step = 95
    assert state.next_period_start_step == 100
    assert state.get_parameters()["dense"] == pytest.approx(1.0)
    state.step = 25
    assert state.get_parameters()["dense"] == pytest.approx(0.5)

    # json round trip
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "state.json"
        state.save(p)
        loaded = TrainerState.load(p)
        assert loaded.step == 25 and loaded.period == 40
        assert loaded.get_parameters()["dense"] == pytest.approx(0.5)


def test_checkpoint_roundtrip(tmp_path) -> None:
    from vod_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "b": jnp.zeros((3,))}
    opt_state = {"m": jnp.ones((2, 3))}
    state = TrainerState(step=7, max_steps=10)
    save_checkpoint(tmp_path / "ck", params=params, opt_state=opt_state, state=state)
    p2, o2, s2 = load_checkpoint(tmp_path / "ck", params_like=params, opt_state_like=opt_state)
    assert np.allclose(np.asarray(p2["w"]), np.asarray(params["w"]))
    assert s2.step == 7


@pytest.mark.slow
def test_training_loop_with_schedules_and_sparse() -> None:
    """training_loop drives schedules into the step; hybrid dense+sparse."""
    from vod_tpu.runtime.train import training_loop

    rng = np.random.default_rng(3)
    corpus, make_queries = _make_task(rng)
    model, tx, step_fn = _model_and_step()
    # sparse engine over the section token lists (terms = token ids)
    docs = [list(map(int, np.asarray(corpus.input_ids[i]))) for i in range(corpus.size)]
    sparse = build_sparse_index(docs, max_postings=64)

    emb = jnp.asarray(rng.normal(size=(corpus.size, 32)).astype("float32"))
    engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"), sparse=sparse)

    def queries_with_terms(seed):
        qb = make_queries(4, seed)
        return qb.replace(terms=qb.input_ids)  # query tokens double as sparse terms

    init_q = queries_with_terms(0)
    batch, _ = device_collate(
        jax.random.PRNGKey(0), engines, corpus, init_q,
        query_vectors=jnp.zeros((4, 32)), prefetch=16, n_sections=4, max_pos_sections=1,
    )
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    opt_state = tx.init(params)

    state = TrainerState(
        max_steps=10, period=None,
        parameters={
            "dense": ParameterSchedule(mode="constant", value=1.0),
            "sparse": ParameterSchedule(mode="linear", start=0.0, value=1.0, period=10),
        },
    )
    logs = []
    params, opt_state, state, last = training_loop(
        step_fn=step_fn, params=params, opt_state=opt_state, engines=engines, corpus=corpus,
        train_queries=(queries_with_terms(i) for i in range(50)),
        state=state, rng=jax.random.PRNGKey(0),
        log_interval=5, on_log=lambda s, m: logs.append((s, m)),
    )
    assert state.step == 10
    assert logs and "loss" in logs[-1][1]
    assert logs[-1][1]["parameters/sparse"] > logs[0][1]["parameters/sparse"] - 1e-9


def test_in_batch_negatives_flat_pool() -> None:
    """in_batch_negatives=True: shared [U]-pool sections, 2-d encoding path."""
    rng = np.random.default_rng(5)
    corpus, make_queries = _make_task(rng)
    cfg = TransformerEncoderConfig(
        vocab_size=VOCAB, hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        dtype=jnp.float32,
        pooler=VodPoolerConfig(agg_method="mean", output_norm="l2", scaler=8.0),
    )
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())
    emb = jnp.asarray(rng.normal(size=(corpus.size, 32)).astype("float32"))
    engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"))
    queries = make_queries(4, 7)
    batch, _ = device_collate(
        jax.random.PRNGKey(0), engines, corpus, queries,
        query_vectors=jnp.asarray(rng.normal(size=(4, 32)).astype("float32")),
        prefetch=8, n_sections=4, max_pos_sections=1, in_batch_negatives=True,
    )
    u = 4 * 4
    assert batch.section__input_ids.shape == (u, corpus.input_ids.shape[-1])
    assert batch.section__score.shape == (4, u)
    assert batch.extras.get("flat_sections") is True
    # pool ids unique among real entries
    pool = np.asarray(batch.section__idx[0])
    # each query's gold id is in the pool with relevance 1
    gold = np.asarray(queries.section_ids)[:, 0]
    rel = np.asarray(batch.section__relevance)
    for i, g in enumerate(gold):
        js = np.where(pool == g)[0]
        assert len(js) >= 1 and rel[i, js[0]] == 1
    # model evaluates on the flat layout
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    out = model.apply(params, batch, mode="evaluate")
    assert out.retriever_scores.shape == (4, u)
    assert np.isfinite(float(out.loss))


@pytest.mark.slow
def test_grad_accumulation_step() -> None:
    rng = np.random.default_rng(6)
    corpus, make_queries = _make_task(rng)
    model, tx, step_fn = _model_and_step()
    emb = jnp.asarray(rng.normal(size=(corpus.size, 32)).astype("float32"))
    engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"))
    q0 = make_queries(4, 0)
    batch, _ = device_collate(
        jax.random.PRNGKey(0), engines, corpus, q0,
        query_vectors=jnp.zeros((4, 32)), prefetch=16, n_sections=4, max_pos_sections=1,
    )
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    opt_state = tx.init(params)
    micro = [make_queries(4, s) for s in range(3)]
    params, opt_state, metrics, rel, scores = step_fn.train_step_accum(
        params, opt_state, engines, corpus, micro, jax.random.PRNGKey(1), {"dense": 1.0}
    )
    assert np.isfinite(float(metrics["loss"]))
    assert rel.shape == (12, 4)  # 3 micro-batches x 4 queries


def test_compute_embeddings_dp_sharded() -> None:
    """Embedding computation shards chunks over the dp mesh axis."""
    from vod_tpu.parallel import make_mesh

    rng = np.random.default_rng(9)
    corpus, _ = _make_task(rng, n_corpus=96)
    model, tx, _ = _model_and_step()
    params = model.init(
        jax.random.PRNGKey(0), corpus.input_ids[:1], corpus.attention_mask[:1],
        method=Ranker.encode_field,
    )
    encode = lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field)
    mesh = make_mesh((8,), ("dp",))
    emb_sharded = compute_embeddings(encode, params, corpus, chunk=16, mesh=mesh)
    emb_plain = compute_embeddings(encode, params, corpus, chunk=16)
    assert np.allclose(np.asarray(emb_sharded), np.asarray(emb_plain), atol=1e-5)


@pytest.mark.slow
def test_training_loop_runs_accumulation() -> None:
    """accumulate_grad_batches > 1 routes the loop through `train_step_accum`:
    N micro-batches per optimizer step (parity: `loops/train.py:76-86`)."""
    from vod_tpu.runtime.train import training_loop

    rng = np.random.default_rng(21)
    corpus, make_queries = _make_task(rng, n_corpus=64)
    cfg = TransformerEncoderConfig(
        vocab_size=VOCAB, hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        dtype=jnp.float32,
        pooler=VodPoolerConfig(agg_method="mean", output_norm="l2", scaler=8.0),
    )
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())
    tx = optax.adam(1e-3)
    step_fn = make_train_step(
        model, tx, prefetch=8, n_sections=2, max_pos_sections=1,
        accumulate_grad_batches=2,
    )
    emb = jnp.asarray(np.random.default_rng(1).normal(size=(corpus.size, 32)), dtype=jnp.float32)
    engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"))
    q0 = make_queries(4, 0)
    init_batch, _ = device_collate(
        jax.random.PRNGKey(0), engines, corpus, q0,
        query_vectors=jnp.zeros((4, 32)), prefetch=8, n_sections=2, max_pos_sections=1,
    )
    params = model.init(jax.random.PRNGKey(0), init_batch, mode="evaluate")
    opt_state = tx.init(params)

    calls = {"accum": 0, "plain": 0}
    orig_accum, orig_plain = step_fn.train_step_accum, step_fn.train_step

    def spy_accum(*a, **k):
        calls["accum"] += 1
        assert len(a[4]) == 2  # micro_batches
        return orig_accum(*a, **k)

    def spy_plain(*a, **k):
        calls["plain"] += 1
        return orig_plain(*a, **k)

    step_fn.train_step_accum = spy_accum
    step_fn.train_step = spy_plain

    state = TrainerState(max_steps=3)
    batches = [make_queries(4, s) for s in range(10)]  # 3 steps consume 6
    params, opt_state, state, last = training_loop(
        step_fn=step_fn, params=params, opt_state=opt_state, engines=engines,
        corpus=corpus, train_queries=iter(batches), state=state,
        rng=jax.random.PRNGKey(2), log_interval=1, prefetch_batches=0,
    )
    assert state.step == 3
    assert calls["accum"] == 3 and calls["plain"] == 0
    assert np.isfinite(last["loss"])


def test_monitor_device_resident_and_correct() -> None:
    """RetrievalMonitor accumulates on device (no per-step host floats) and its
    NaN-aware mean matches a numpy recomputation."""
    from vod_tpu.models.monitoring import RetrievalMonitor, retrieval_metrics

    mon = RetrievalMonitor(["mrr", "recall_2", "kldiv"])
    rng = np.random.default_rng(3)
    all_rel, all_scores = [], []
    for _ in range(4):
        rel = (rng.random((5, 6)) < 0.3).astype("float32")
        sc = rng.normal(size=(5, 6)).astype("float32")
        all_rel.append(rel)
        all_scores.append(sc)
        mon.update(relevances=jnp.asarray(rel), scores=jnp.asarray(sc))
        # state stays on device between updates
        for s, c in mon._state.values():
            assert isinstance(s, jax.Array) and isinstance(c, jax.Array)
    got = mon.compute()
    vals = retrieval_metrics(
        ["mrr", "recall_2", "kldiv"],
        relevances=jnp.asarray(np.concatenate(all_rel)),
        scores=jnp.asarray(np.concatenate(all_scores)),
    )
    for m, v in vals.items():
        v = np.asarray(v)
        expected = float(np.nanmean(v)) if np.any(~np.isnan(v)) else float("nan")
        assert np.isclose(got[m], expected, atol=1e-5, equal_nan=True), m


def test_compute_embeddings_to_host_matches_device() -> None:
    """Streamed host-slab embedding == the device path (VERDICT r2 #2)."""
    from vod_tpu.runtime.predict import compute_embeddings_to_host

    rng = np.random.default_rng(17)
    corpus, _ = _make_task(rng, n_corpus=100)
    model, tx, _ = _model_and_step()
    params = model.init(
        jax.random.PRNGKey(0), corpus.input_ids[:1], corpus.attention_mask[:1],
        method=Ranker.encode_field,
    )
    encode = lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field)
    ref = np.asarray(compute_embeddings(encode, params, corpus, chunk=16))
    # slab NOT a divisor of n: exercises partial-slab padding; derived mask path
    got = compute_embeddings_to_host(
        encode, params, np.asarray(corpus.input_ids), np.asarray(corpus.attention_mask),
        chunk=16, slab=48,
    )
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_build_dense_from_host_matches_device_build() -> None:
    """Host-slab factory build (pq + int8, sharded and not) returns indexes
    whose search results match the in-HBM builds."""
    from vod_tpu.configs.search import DenseFactoryConfig
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search.base import SearchQueries
    from vod_tpu.search.dense import dense_search, pq_search
    from vod_tpu.search.factory import build_dense_from_host
    from vod_tpu.search.sharded import ShardedDenseIndex, sharded_dense_search

    rng = np.random.default_rng(18)
    n, d, b, k = 1500, 32, 4, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[:b] + 0.05 * rng.standard_normal((b, d)).astype(np.float32)
    jq = jnp.asarray(q)
    expected = np.argsort(-(q @ emb.T), axis=-1)[:, :k]

    def recall(ind: np.ndarray) -> float:
        return float(np.mean([len(set(ind[i].tolist()) & set(expected[i])) / k for i in range(b)]))

    cfg = DenseFactoryConfig(
        codec="pq", n_subquantizers=8, coarse_dim=None, kmeans_iters=3,
        refine="int8", k_factor=8, approx_recall=None,
    )
    idx = build_dense_from_host(cfg, emb, slab=512)
    out = pq_search(idx, SearchQueries(vector=jq), top_k=k, chunk=256)
    assert recall(np.asarray(out.indices)) >= 0.8

    cfg8 = DenseFactoryConfig(codec="int8", approx_recall=None)
    idx8 = build_dense_from_host(cfg8, emb, slab=512)
    out8 = dense_search(idx8, SearchQueries(vector=jq), top_k=k, chunk=256)
    assert recall(np.asarray(out8.indices)) >= 0.9

    mesh = make_mesh((8,), ("shard",))
    cfg8s = DenseFactoryConfig(codec="int8", sharded=True, approx_recall=None)
    idx8s = build_dense_from_host(cfg8s, emb, slab=512, mesh=mesh)
    assert isinstance(idx8s, ShardedDenseIndex)
    out8s = sharded_dense_search(idx8s, SearchQueries(vector=jq), top_k=k, chunk=128)
    got8, got8s = np.asarray(out8.indices), np.asarray(out8s.indices)
    for i in range(b):
        assert set(got8s[i].tolist()) == set(got8[i].tolist()), i


@pytest.mark.slow
def test_periodic_training_streams_when_over_budget() -> None:
    """embed_hbm_budget_bytes=1 forces the host-slab re-embed + host index
    build (the 8.8M-scale route); the period must complete with a PQIndex."""
    from vod_tpu.exps.recipes import PeriodicTrainingConfig, periodic_training
    from vod_tpu.configs.search import DenseFactoryConfig
    from vod_tpu.search.dense import PQIndex

    rng = np.random.default_rng(19)
    corpus, make_queries = _make_task(rng, n_corpus=96)
    model, tx, step_fn = _model_and_step()
    params = model.init(
        jax.random.PRNGKey(0), corpus.input_ids[:1], corpus.attention_mask[:1],
        method=Ranker.encode_field,
    )
    opt_state = tx.init(params)
    state = TrainerState(max_steps=2, period=2)

    import vod_tpu.search.factory as factory_mod

    built = []
    orig = factory_mod.build_dense_from_host

    def spy(cfg, emb_np, **kw):
        idx = orig(cfg, emb_np, **kw)
        built.append(type(idx))
        return idx

    import vod_tpu.exps.recipes as recipes_mod
    prev = factory_mod.build_dense_from_host
    factory_mod.build_dense_from_host = spy
    try:
        params, opt_state, state, history = periodic_training(
            model=model, step_fn=step_fn, params=params, opt_state=opt_state,
            corpus=corpus, state=state,
            train_queries_fn=lambda pidx: [make_queries(8, 100 + pidx * 10 + i) for i in range(2)],
            rng=jax.random.PRNGKey(1),
            config=PeriodicTrainingConfig(
                embed_chunk=16,
                embed_hbm_budget_bytes=1,
                dense=DenseFactoryConfig(
                    codec="pq", n_subquantizers=4, coarse_dim=None,
                    kmeans_iters=2, refine="int8", k_factor=4,
                ),
            ),
        )
    finally:
        factory_mod.build_dense_from_host = prev
    assert state.step == 2
    assert built and all(t is PQIndex for t in built)
    assert all(np.isfinite(h["train"]["loss"]) for h in history)


def test_accumulation_drops_partial_tail_window() -> None:
    """Iterator exhaustion mid-accumulation-window must NOT apply a short
    window (parity: the reference's fixed window never applies pending grads,
    `loops/train.py:76-86`)."""
    from vod_tpu.runtime.train import make_train_step, training_loop
    from vod_tpu.search import HybridEngines, build_dense_index

    rng = np.random.default_rng(20)
    corpus, make_queries = _make_task(rng, n_corpus=64)
    cfg = TransformerEncoderConfig(
        vocab_size=VOCAB, hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        dtype=jnp.float32,
        pooler=VodPoolerConfig(agg_method="mean", output_norm="l2", scaler=8.0, learn_scaler=True),
    )
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())
    tx = optax.adam(3e-3)
    step_fn = make_train_step(
        model, tx, prefetch=16, n_sections=4, max_pos_sections=1,
        accumulate_grad_batches=2,
    )
    params = model.init(
        jax.random.PRNGKey(0), corpus.input_ids[:1], corpus.attention_mask[:1],
        method=Ranker.encode_field,
    )
    opt_state = tx.init(params)
    encode = lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field)
    emb = compute_embeddings(encode, params, corpus, chunk=16)
    engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"))
    state = TrainerState(max_steps=10, period=10)
    # 5 batches with accum=2 -> 2 full windows + 1 orphan = 2 optimizer steps
    params, opt_state, state, _ = training_loop(
        step_fn=step_fn, params=params, opt_state=opt_state, engines=engines,
        corpus=corpus, train_queries=[make_queries(4, s) for s in range(5)],
        state=state, rng=jax.random.PRNGKey(1), prefetch_batches=0,
    )
    assert state.step == 2, state.step


def test_profiler_trace_hook(tmp_path) -> None:
    """profile_dir captures a jax.profiler trace window around steps [1, 2)."""
    from vod_tpu.runtime.train import training_loop
    from vod_tpu.search import HybridEngines, build_dense_index

    rng = np.random.default_rng(21)
    corpus, make_queries = _make_task(rng, n_corpus=48)
    model, tx, step_fn = _model_and_step()
    params = model.init(
        jax.random.PRNGKey(0), corpus.input_ids[:1], corpus.attention_mask[:1],
        method=Ranker.encode_field,
    )
    opt_state = tx.init(params)
    encode = lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field)
    emb = compute_embeddings(encode, params, corpus, chunk=16)
    engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"))
    state = TrainerState(max_steps=3, period=3)
    training_loop(
        step_fn=step_fn, params=params, opt_state=opt_state, engines=engines,
        corpus=corpus, train_queries=[make_queries(4, s) for s in range(3)],
        state=state, rng=jax.random.PRNGKey(1), prefetch_batches=0,
        profile_dir=str(tmp_path / "trace"), profile_steps=(1, 2),
    )
    produced = list((tmp_path / "trace").rglob("*"))
    assert any(p.is_file() for p in produced), produced


def test_moe_encoder_train_step_runs_with_aux_loss() -> None:
    """MoE encoder (moe_experts>0) trains end-to-end: the Switch aux loss is
    sowed into the "losses" collection, the train step adds it, expert
    weights receive gradients (they change after one step)."""
    rng = np.random.default_rng(3)
    corpus, make_queries = _make_task(rng, n_corpus=64)
    cfg = TransformerEncoderConfig(
        vocab_size=VOCAB, hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        dtype=jnp.float32, moe_experts=4, moe_top_k=2,
        pooler=VodPoolerConfig(agg_method="mean", output_norm="l2", scaler=8.0, learn_scaler=True),
    )
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())
    step_fn = make_train_step(
        model, optax.adam(3e-3), prefetch=8, n_sections=4, max_pos_sections=1,
        gradient_clip_val=1.0,
    )
    queries = make_queries(4, 1)
    emb = jnp.asarray(rng.normal(size=(corpus.size, 32)).astype("float32"))
    engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"))
    batch, _ = device_collate(
        jax.random.PRNGKey(0), engines, corpus, queries,
        query_vectors=jnp.asarray(rng.normal(size=(4, 32)).astype("float32")),
        prefetch=8, n_sections=4, max_pos_sections=1,
    )
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    assert "losses" not in params, "init must not leak the sowed collection"
    wi_before = np.array(
        jax.tree_util.tree_leaves(
            {k: v for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
             if "moe" in jax.tree_util.keystr(k) and "wi" in jax.tree_util.keystr(k)}
        )[0]
    )
    opt_state = step_fn.tx.init(params)
    params, opt_state, metrics, _rel, _scores = step_fn.train_step(
        params, opt_state, engines, corpus, queries, jax.random.PRNGKey(1), None,
    )
    assert np.isfinite(float(metrics["loss"]))
    wi_after = np.array(
        jax.tree_util.tree_leaves(
            {k: v for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
             if "moe" in jax.tree_util.keystr(k) and "wi" in jax.tree_util.keystr(k)}
        )[0]
    )
    assert not np.allclose(wi_before, wi_after), "expert weights did not receive grads"


def test_benchmark_reranker_score_key() -> None:
    """A perfect second-stage reranker (scores = gold labels) lifts the
    'rerank' key to ceiling metrics while first-stage keys stay imperfect."""
    from vod_tpu.runtime.benchmark import benchmark_retrieval

    rng = np.random.default_rng(5)
    corpus, make_queries = _make_task(rng, n_corpus=64)
    emb = jnp.asarray(rng.normal(size=(corpus.size, 16)).astype("float32"))
    engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"))
    batches = [make_queries(4, s) for s in range(2)]
    qvecs = [jnp.asarray(rng.normal(size=(4, 16)).astype("float32")) for _ in batches]

    def perfect_reranker(bi, merged):
        return jnp.where(
            jnp.maximum(merged.labels, 0) > 0, 10.0, jnp.zeros_like(merged.scores)
        )

    out = benchmark_retrieval(
        engines, batches, query_vectors=qvecs, top_k=16,
        metrics=("ndcg_10", "mrr_10"), reranker=perfect_reranker,
    )
    assert out["rerank"]["mrr_10"] == pytest.approx(1.0)
    assert out["dense"]["mrr_10"] <= 1.0
