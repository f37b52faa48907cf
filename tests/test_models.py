"""Model-layer tests: encoders, gradient estimators, metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vod_tpu.models import (
    CausalLMConfig,
    MarginalLikelihoodGradients,
    Ranker,
    Realm,
    RetrievalGradients,
    TransformerEncoderConfig,
    VodGradients,
    VodPoolerConfig,
    retrieval_metrics,
)
from vod_tpu.models.monitoring import RetrievalMonitor, parse_metric_name
from vod_tpu.types import RealmBatch


def _toy_cfg(**pooler_kw) -> TransformerEncoderConfig:
    return TransformerEncoderConfig(
        vocab_size=100,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        dtype=jnp.float32,
        pooler=VodPoolerConfig(**pooler_kw),
    )


def _toy_batch(rng: np.random.Generator, b=2, d=4, lq=8, ls=8, lm_len=None) -> RealmBatch:
    scores = rng.normal(size=(b, d)).astype("float32")
    scores[:, -1] = -np.inf  # one padding slot
    rel = np.zeros((b, d), dtype="float32")
    rel[:, 0] = 1.0  # first section positive
    kw = {}
    if lm_len:
        kw["lm__input_ids"] = jnp.asarray(rng.integers(1, 100, size=(b, d, lm_len)).astype("int32"))
        kw["lm__attention_mask"] = jnp.asarray(np.ones((b, d, lm_len), dtype="int32"))
    lw = np.log(np.full((b, d), 1.0 / (d - 1), dtype="float32"))
    lw[:, -1] = -np.inf
    return RealmBatch(
        query__input_ids=jnp.asarray(rng.integers(1, 100, size=(b, lq)).astype("int32")),
        query__attention_mask=jnp.ones((b, lq), dtype="int32"),
        section__input_ids=jnp.asarray(rng.integers(1, 100, size=(b * d, ls)).astype("int32")),
        section__attention_mask=jnp.ones((b * d, ls), dtype="int32"),
        section__relevance=jnp.asarray(rel),
        section__idx=jnp.asarray(rng.integers(0, 1000, size=(b, d)).astype("int32")),
        section__score=jnp.asarray(scores),
        section__sparse=jnp.asarray(rng.normal(size=(b, d)).astype("float32")),
        section__dense=jnp.asarray(rng.normal(size=(b, d)).astype("float32")),
        section__log_weight=jnp.asarray(lw),
        section__lse_pos=jnp.zeros((b,), dtype="float32"),
        section__lse_neg=jnp.zeros((b,), dtype="float32"),
        **kw,
    )


@pytest.mark.parametrize("grad_cls", [RetrievalGradients, VodGradients])
@pytest.mark.slow
def test_ranker_training_raises_positive_prob(grad_cls) -> None:
    """SGD on a fixed batch must raise the positive sections' model probability.

    (The REINFORCE-style surrogate's VALUE is not monotone — the KL gradient is
    what matters, so we track the positive log-prob, not the loss value.)
    """
    rng = np.random.default_rng(0)
    batch = _toy_batch(rng)
    model = Ranker(cfg=_toy_cfg(), gradients=grad_cls())
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, batch, mode="evaluate")
            lp = jax.nn.log_softmax(
                jnp.where(jnp.isfinite(out.retriever_scores), out.retriever_scores, -jnp.inf)
            )
            return out.loss, lp[:, 0].mean()

        (loss, pos_lp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, pos_lp

    pos = []
    for _ in range(15):
        params, opt_state, loss, pos_lp = step(params, opt_state)
        assert np.isfinite(float(loss))
        pos.append(float(pos_lp))
    assert pos[-1] > pos[0], pos


def test_retrieval_gradients_pushes_positives_up() -> None:
    """The KL gradient must increase positive-section scores relative to negatives."""
    b, d, h = 3, 5, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, h)).astype("float32"))
    s = jnp.asarray(rng.normal(size=(b, d, h)).astype("float32"))
    batch = _toy_batch(rng, b=b, d=d)
    grad_fn = RetrievalGradients()

    def loss(q, s):
        return grad_fn(batch=batch, query_encoding=q, section_encoding=s).loss

    gq = jax.grad(loss, argnums=0)(q, s)
    # moving q along -grad must raise positive logit share
    out0 = grad_fn(batch=batch, query_encoding=q, section_encoding=s)
    out1 = grad_fn(batch=batch, query_encoding=q - 0.1 * gq, section_encoding=s)
    lp0 = np.asarray(jax.nn.log_softmax(np.where(np.isfinite(out0.retriever_scores), out0.retriever_scores, -np.inf)))
    lp1 = np.asarray(jax.nn.log_softmax(np.where(np.isfinite(out1.retriever_scores), out1.retriever_scores, -np.inf)))
    assert np.mean(lp1[:, 0]) > np.mean(lp0[:, 0])


def test_realm_marginal_likelihood_and_vod() -> None:
    rng = np.random.default_rng(2)
    batch = _toy_batch(rng, lm_len=10)
    model = Realm(
        cfg=_toy_cfg(),
        lm_cfg=CausalLMConfig(vocab_size=100, hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64, dtype=jnp.float32),
        gradients=MarginalLikelihoodGradients(),
    )
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    out = model.apply(params, batch, mode="evaluate")
    assert np.isfinite(float(out.loss))

    vod_model = Realm(
        cfg=_toy_cfg(),
        lm_cfg=CausalLMConfig(vocab_size=100, hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64, dtype=jnp.float32),
        gradients=VodGradients(alpha=0.5),
    )
    out2 = vod_model.apply(params, batch, mode="evaluate")
    assert np.isfinite(float(out2.loss))
    # alpha=0 (IWAE bound) must also be finite and differ in general
    out3 = Realm(
        cfg=_toy_cfg(),
        lm_cfg=CausalLMConfig(vocab_size=100, hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64, dtype=jnp.float32),
        gradients=VodGradients(alpha=0.0),
    ).apply(params, batch, mode="evaluate")
    assert np.isfinite(float(out3.loss))


def test_pooler_variants() -> None:
    from vod_tpu.models.pooler import VodPooler, VodPoolerConfig

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 8)).astype("float32"))
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype="int32")
    for agg in ["mean", "max", "cls"]:
        mod = VodPooler(VodPoolerConfig(agg_method=agg, output_norm="l2"), 8)
        params = mod.init(jax.random.PRNGKey(0), x, mask)
        out = mod.apply(params, x, mask)
        assert out.shape == (2, 8)
        assert np.allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)
    # learnable scaler changes output magnitude
    mod = VodPooler(VodPoolerConfig(agg_method="mean", scaler=4.0, learn_scaler=True), 8)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    out = mod.apply(params, x, mask)
    base = VodPooler(VodPoolerConfig(agg_method="mean"), 8)
    outb = base.apply(base.init(jax.random.PRNGKey(0), x, mask), x, mask)
    assert np.allclose(np.asarray(out), 2.0 * np.asarray(outb), atol=1e-5)


def test_metric_values_hand_computed() -> None:
    # query 0: positive at rank 2; query 1: positive at rank 1; query 2: no positive
    scores = jnp.asarray([[3.0, 2.0, 1.0], [5.0, 0.0, -1.0], [1.0, 2.0, 3.0]])
    rel = jnp.asarray([[0, 1, 0], [1, 0, 0], [0, 0, 0]])
    out = retrieval_metrics(["mrr", "hitrate_1", "recall_2", "ndcg_3"], relevances=rel, scores=scores)
    assert np.allclose(np.asarray(out["mrr"]), [0.5, 1.0, 0.0])
    assert np.allclose(np.asarray(out["hitrate_1"]), [0.0, 1.0, 0.0])
    r2 = np.asarray(out["recall_2"])
    assert np.allclose(r2[:2], [1.0, 1.0])
    assert np.isnan(r2[2])
    ndcg = np.asarray(out["ndcg_3"])
    assert np.isclose(ndcg[1], 1.0)
    assert 0 < ndcg[0] < 1.0


def test_monitor_aggregation() -> None:
    mon = RetrievalMonitor(["mrr", "recall_10"])
    rng = np.random.default_rng(0)
    for _ in range(3):
        scores = jnp.asarray(rng.normal(size=(4, 8)).astype("float32"))
        rel = jnp.asarray((rng.uniform(size=(4, 8)) > 0.7).astype("int32"))
        mon.update(relevances=rel, scores=scores)
    out = mon.compute()
    assert 0 <= out["mrr"] <= 1

    assert parse_metric_name("ndcg_10") == ("ndcg", 10)
    assert parse_metric_name("mrr") == ("mrr", 0)
    with pytest.raises(ValueError):
        parse_metric_name("bogus_5")


def test_realm_generate_mode() -> None:
    rng = np.random.default_rng(4)
    batch = _toy_batch(rng, b=2, d=2, lm_len=6)
    model = Realm(
        cfg=_toy_cfg(),
        lm_cfg=CausalLMConfig(vocab_size=100, hidden_size=32, num_layers=1, num_heads=2,
                              intermediate_size=64, dtype=jnp.float32),
        gradients=MarginalLikelihoodGradients(),
    )
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    toks = model.apply(params, batch, mode="generate", max_new_tokens=4)
    assert toks.shape == (4, 4)  # B*D rows, 4 new tokens
    assert np.all((np.asarray(toks) >= 0) & (np.asarray(toks) < 100))


@pytest.mark.slow
def test_lora_and_remat_encoder() -> None:
    from vod_tpu.models.encoder import VodEncoder, lora_trainable_mask

    cfg = _toy_cfg().replace(lora_rank=4, remat=True)
    model = VodEncoder(cfg)
    ids = jnp.ones((2, 8), dtype="int32")
    mask = jnp.ones((2, 8), dtype="int32")
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (2, 32)
    # lora params exist; mask marks only adapters (+pooler) trainable
    m = lora_trainable_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(m)[0]
    lora_flags = [v for p, v in flat if "lora" in jax.tree_util.keystr(p)]
    base_flags = [v for p, v in flat if "base" in jax.tree_util.keystr(p) and "lora" not in jax.tree_util.keystr(p)]
    assert lora_flags and all(lora_flags)
    assert base_flags and not any(base_flags)
    # grads flow through remat path
    g = jax.grad(lambda p: model.apply(p, ids, mask).sum())(params)
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


def test_psum_metric_aggregation() -> None:
    from vod_tpu.models.monitoring import aggregate_metrics_psum
    from vod_tpu.parallel import make_mesh
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh((8,), ("dp",))
    vals = jnp.arange(8.0)

    def fn(v):
        return aggregate_metrics_psum({"m": v}, "dp")["m"]

    out = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=P("dp"), out_specs=P()))(vals)
    assert np.isclose(float(np.asarray(out)[0] if np.ndim(out) else out), 3.5)


@pytest.mark.slow
def test_seq2seq_realm_training_step() -> None:
    """T5 seq2seq reader in a Realm system (BASELINE config #5 shape)."""
    from vod_tpu.models.seq2seq import Seq2SeqRealm
    from vod_tpu.models.t5_encoder import T5EncoderConfig

    rng = np.random.default_rng(7)
    b, d, lm_len = 2, 3, 12
    batch = _toy_batch(rng, b=b, d=d, lm_len=lm_len)
    # token_type_ids: first 8 tokens context/question, last 4 answer
    tt = np.zeros((b, d, lm_len), dtype="int32")
    tt[..., 8:] = 2
    batch = batch.replace(lm__token_type_ids=jnp.asarray(tt))

    model = Seq2SeqRealm(
        cfg=_toy_cfg(),
        reader_cfg=T5EncoderConfig(
            vocab_size=100, hidden_size=32, num_layers=1, num_heads=2, head_dim=16,
            intermediate_size=64, relative_attention_num_buckets=8,
            relative_attention_max_distance=16, dtype=jnp.float32,
        ),
        gradients=VodGradients(alpha=0.5),
    )
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    out = model.apply(params, batch, mode="evaluate")
    assert np.isfinite(float(out.loss))
    # gradients flow through retriever AND reader
    g = jax.grad(lambda p: model.apply(p, batch, mode="evaluate").loss)(params)
    leaves = jax.tree_util.tree_flatten_with_path(g)[0]
    reader_norm = sum(float(jnp.abs(v).sum()) for k, v in leaves if "reader" in jax.tree_util.keystr(k))
    enc_norm = sum(float(jnp.abs(v).sum()) for k, v in leaves if "'encoder'" in jax.tree_util.keystr(k))
    assert reader_norm > 0 and enc_norm > 0


def _vod_batch(scores, rel, log_w, lse_pos, lse_neg):
    """Minimal RealmBatch for direct gradient-estimator calls (token fields unused)."""
    b, d = scores.shape
    dummy_q = jnp.ones((b, 4), dtype="int32")
    dummy_s = jnp.ones((b * d, 4), dtype="int32")
    return RealmBatch(
        query__input_ids=dummy_q,
        query__attention_mask=dummy_q,
        section__input_ids=dummy_s,
        section__attention_mask=dummy_s,
        section__relevance=jnp.asarray(rel),
        section__idx=jnp.zeros((b, d), dtype="int32"),
        section__score=jnp.asarray(scores),
        section__sparse=jnp.full((b, d), jnp.nan, dtype="float32"),
        section__log_weight=jnp.asarray(log_w),
        section__lse_pos=jnp.asarray(lse_pos),
        section__lse_neg=jnp.asarray(lse_neg),
    )


def test_vod_gradients_exact_on_full_support() -> None:
    """With every candidate sampled, VOD's log Z_hat must equal logsumexp(f) exactly,
    so the retriever-only loss equals the brute-force softmax CE over the candidates.

    This is the regression test for the per-group proposal normalizers
    (section__lse_pos/neg): self-normalized group weights alone mis-weight
    positives vs negatives; adding lse_g makes the estimator exact here.
    """
    rng = np.random.default_rng(7)
    b, d, n_pos = 3, 6, 2
    s = rng.normal(size=(b, d)).astype("float32")  # proposal scores
    f = rng.normal(size=(b, d)).astype("float32")  # retriever scores
    rel = np.zeros((b, d), dtype="float32")
    rel[:, :n_pos] = 1.0

    # Full-support sampling weights: log_softmax of s within each label group.
    def lsm(x):
        return x - np.log(np.sum(np.exp(x)))

    log_w = np.zeros_like(s)
    for i in range(b):
        log_w[i, :n_pos] = lsm(s[i, :n_pos])
        log_w[i, n_pos:] = lsm(s[i, n_pos:])
    lse_pos = np.log(np.sum(np.exp(s[:, :n_pos]), axis=-1)).astype("float32")
    lse_neg = np.log(np.sum(np.exp(s[:, n_pos:]), axis=-1)).astype("float32")

    batch = _vod_batch(s, rel, log_w, lse_pos, lse_neg)
    q = jnp.ones((b, 1), dtype="float32")
    sec = jnp.asarray(f)[..., None]  # H=1 -> retriever scores == f

    loss = float(VodGradients()(batch=batch, query_encoding=q, section_encoding=sec).loss)
    log_z = np.log(np.sum(np.exp(f), axis=-1))
    exact = float(np.mean(-(np.mean(f[:, :n_pos], axis=-1) - log_z)))
    np.testing.assert_allclose(loss, exact, rtol=2e-5)

    # Without the group normalizers (lse = 0) the estimate must differ.
    batch0 = _vod_batch(s, rel, log_w, np.zeros(b, "float32"), np.zeros(b, "float32"))
    loss0 = float(VodGradients()(batch=batch0, query_encoding=q, section_encoding=sec).loss)
    assert abs(loss0 - exact) > 1e-3


@pytest.mark.slow
def test_vod_logz_consistent_under_subsampling() -> None:
    """E[Z_hat] over sampling draws approaches the true partition function Z."""
    from vod_tpu.ops.sample import labeled_priority_sampling

    rng = np.random.default_rng(11)
    n, k_total, trials = 64, 8, 512
    s = rng.normal(size=(n,)).astype("float32")
    f = (s + 0.3 * rng.normal(size=(n,))).astype("float32")
    labels = np.zeros((n,), dtype=bool)
    labels[0] = True  # single positive, always drawn into slot 0

    keys = jax.random.split(jax.random.PRNGKey(3), trials)
    s_b = jnp.broadcast_to(jnp.asarray(s), (trials, n))
    l_b = jnp.broadcast_to(jnp.asarray(labels), (trials, n))
    ids, log_w, out_labels, lse = labeled_priority_sampling(
        jax.random.PRNGKey(3), s_b, l_b, k_positive=1, k_total=k_total
    )
    safe = jnp.clip(ids, 0, n - 1)
    pad = ids < 0
    s_s = jnp.where(pad, -jnp.inf, jnp.asarray(s)[safe])
    f_s = jnp.asarray(f)[safe]

    def row_loss(s_row, rel_row, lw_row, lse_row, f_row):
        batch = _vod_batch(
            s_row[None], rel_row[None].astype(jnp.float32), lw_row[None],
            lse_row[0][None], lse_row[1][None],
        )
        q = jnp.ones((1, 1), dtype="float32")
        return VodGradients()(batch=batch, query_encoding=q, section_encoding=f_row[None, :, None]).loss

    losses = jax.vmap(row_loss)(s_s, out_labels, log_w, lse, f_s)
    # single positive: loss_row = log Z_hat - f_pos
    log_z_hat = np.asarray(losses) + f[0]
    z_bar = float(np.mean(np.exp(log_z_hat)))
    z_true = float(np.sum(np.exp(f)))
    assert abs(z_bar - z_true) / z_true < 0.15, (z_bar, z_true)


def test_in_batch_negatives_cross_query_sections_get_gradient() -> None:
    """Cross-query pool sections must act as live negatives, not padding."""
    from vod_tpu.ops.in_batch_negatives import flatten_samples
    from vod_tpu.ops.sample import PrioritySampledSections
    from vod_tpu.types.retrieval import RetrievalBatch as RB

    samples = PrioritySampledSections(
        batch=RB(
            indices=jnp.asarray([[0, 1], [2, 3]], dtype=jnp.int32),
            scores=jnp.asarray([[1.0, 0.5], [0.9, 0.4]], dtype=jnp.float32),
            labels=jnp.asarray([[1, 0], [1, 0]], dtype=jnp.int32),
        ),
        log_weights=jnp.log(jnp.asarray([[0.6, 0.4], [0.7, 0.3]], dtype=jnp.float32)),
        max_sampling_id=jnp.zeros((2,), dtype=jnp.float32),
        lse_pos=jnp.zeros((2,), dtype=jnp.float32),
        lse_neg=jnp.zeros((2,), dtype=jnp.float32),
        raw_scores={},
    )
    flat = flatten_samples(samples)
    # disjoint ids -> a full 4-wide pool; every (query, section) score is finite
    assert np.isfinite(np.asarray(flat.scores)).all()
    # absent pairs are filled at row_min - 1, strictly below retrieved scores
    assert float(flat.scores[0, 2]) == pytest.approx(0.5 - 1.0)

    b, u, h = 2, 4, 4
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(b, h)).astype("float32"))
    e = jnp.asarray(rng.normal(size=(b, u, h)).astype("float32"))
    batch = _vod_batch(flat.scores, flat.labels.astype(jnp.float32), flat.log_weights,
                       flat.lse_pos, flat.lse_neg)

    g = jax.grad(
        lambda e_: RetrievalGradients()(batch=batch, query_encoding=q, section_encoding=e_).loss
    )(e)
    # query 0 never retrieved pool ids 2,3 (positions 2,3) -> they must still get gradient
    assert float(jnp.abs(g[0, 2:]).sum()) > 0.0
    assert float(jnp.abs(g[1, :2]).sum()) > 0.0


def test_kbit_qlora_training() -> None:
    """kbit tweak (parity: `prepare_for_kbit_training`, reference
    `vod_models/support.py:30`): base kernels stored int8, only LoRA/pooler
    params receive gradients, and the loss still goes down."""
    import optax

    from vod_tpu.models.encoder import lora_trainable_mask
    from vod_tpu.models.kbit import (
        QuantizedLeaf,
        kbit_materialize,
        kbit_memory_bytes,
        kbit_prepare,
    )

    cfg = TransformerEncoderConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, dtype=jnp.float32, lora_rank=4,
        pooler=VodPoolerConfig(agg_method="mean", output_norm="l2", scaler=8.0),
    )
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 64, (8, 10)), dtype="int32")
    mask = jnp.ones((8, 10), "int32")
    params = model.init(jax.random.PRNGKey(0), ids, mask, method=Ranker.encode_field)

    kb = kbit_prepare(params, lora_trainable_mask(params))
    # the attention/FFN base kernels must actually be int8-quantized
    q_leaves = [v for v in kb.frozen.values() if isinstance(v, QuantizedLeaf)]
    assert q_leaves and all(v.codes.dtype == jnp.int8 for v in q_leaves)
    mem = kbit_memory_bytes(kb)
    full_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    assert mem["frozen"] + mem["trainable"] < 0.55 * full_bytes  # ~4x on kernels

    # materialized tree has the original structure and close values
    full = kbit_materialize(kb.trainable, kb.frozen, kb.treedef, kb.paths)
    assert jax.tree_util.tree_structure(full) == jax.tree_util.tree_structure(params)
    ref_out = model.apply(params, ids, mask, method=Ranker.encode_field)
    q_out = model.apply(full, ids, mask, method=Ranker.encode_field)
    assert np.allclose(np.asarray(ref_out), np.asarray(q_out), atol=0.1)

    # a contrastive toy objective through the quantized base: loss decreases
    target = jax.nn.one_hot(np.arange(8) % 4, 32)

    def loss_fn(trainable, frozen):
        p = kbit_materialize(trainable, frozen, kb.treedef, kb.paths)
        enc = model.apply(p, ids, mask, method=Ranker.encode_field)
        return jnp.mean((enc - target) ** 2)

    tx = optax.adam(1e-2)
    opt_state = tx.init(kb.trainable)
    trainable = kb.trainable
    losses = []

    @jax.jit
    def step(trainable, opt_state):
        l, g = jax.value_and_grad(loss_fn)(trainable, kb.frozen)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(trainable, updates), opt_state, l

    for _ in range(20):
        trainable, opt_state, l = step(trainable, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


def test_seq2seq_realm_generate() -> None:
    """KV-cached answer generation from a Realm batch: static shapes, finished
    rows pad with 0 after EOS, tokens stay in-vocab."""
    from vod_tpu.models.seq2seq import Seq2SeqRealm, realm_generate
    from vod_tpu.models.t5_encoder import T5EncoderConfig

    rng = np.random.default_rng(11)
    b, d, lm_len, t = 2, 3, 12, 5
    batch = _toy_batch(rng, b=b, d=d, lm_len=lm_len)
    tt = np.zeros((b, d, lm_len), dtype="int32")
    tt[..., 8:] = 2
    batch = batch.replace(lm__token_type_ids=jnp.asarray(tt))

    model = Seq2SeqRealm(
        cfg=_toy_cfg(),
        reader_cfg=T5EncoderConfig(
            vocab_size=100, hidden_size=32, num_layers=2, num_heads=2, head_dim=16,
            intermediate_size=64, relative_attention_num_buckets=8,
            relative_attention_max_distance=16, dtype=jnp.float32,
        ),
        gradients=VodGradients(alpha=0.5),
    )
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    toks = np.asarray(realm_generate(model, params, batch, max_new_tokens=t))
    assert toks.shape == (b * d, t)
    assert toks.min() >= 0 and toks.max() < 100
    # post-EOS positions are padded with 0
    for row in toks:
        eos = np.where(row == 1)[0]
        if eos.size:
            assert (row[eos[0] + 1 :] == 0).all()


def test_generation_metrics() -> None:
    """EM/token-F1 of top-section generation vs the gold answer segment:
    a perfect generation scores 1/1, a wrong one 0/partial."""
    from vod_tpu.runtime.generation import generation_metrics

    b, d, lm_len, t = 2, 2, 10, 6
    ids = np.zeros((b, d, lm_len), dtype="int32")
    tt = np.zeros((b, d, lm_len), dtype="int32")
    mask = np.ones((b, d, lm_len), dtype="int32")
    # answer segment (tt==2) at positions 6..9: [7, 8, 9, EOS=1]
    tt[..., 6:] = 2
    ids[..., 6:] = [7, 8, 9, 1]
    batch = RealmBatch(
        query__input_ids=jnp.ones((b, 4), "int32"),
        query__attention_mask=jnp.ones((b, 4), "int32"),
        section__input_ids=jnp.ones((b * d, 4), "int32"),
        section__attention_mask=jnp.ones((b * d, 4), "int32"),
        section__relevance=jnp.zeros((b, d)),
        section__sparse=jnp.full((b, d), jnp.nan),
        section__idx=jnp.zeros((b, d), "int32"),
        section__score=jnp.asarray([[2.0, 1.0], [1.0, 2.0]]),  # best: 0 then 1
        lm__input_ids=jnp.asarray(ids),
        lm__attention_mask=jnp.asarray(mask),
        lm__token_type_ids=jnp.asarray(tt),
    )
    gen = np.zeros((b * d, t), dtype="int32")
    gen[0] = [7, 8, 9, 1, 0, 0]      # q0 best section: exact (EOS-terminated)
    gen[3] = [7, 7, 1, 0, 0, 0]      # q1 best section: partial overlap
    m = generation_metrics(jnp.asarray(gen), batch)
    assert m["gen/exact_match"] == 0.5
    # q0 f1 = 1.0; q1: gen [7,7] vs gold [7,8,9] -> common 1, p=0.5, r=1/3, f1=0.4
    assert abs(m["gen/token_f1"] - (1.0 + 0.4) / 2) < 1e-6


def test_evaluate_generation_end_to_end() -> None:
    """`evaluate_generation` drives KV-cached decoding over a Realm batch and
    returns bounded metrics."""
    from vod_tpu.models.seq2seq import Seq2SeqRealm
    from vod_tpu.models.t5_encoder import T5EncoderConfig
    from vod_tpu.runtime.generation import evaluate_generation

    rng = np.random.default_rng(21)
    b, d, lm_len = 2, 2, 12
    batch = _toy_batch(rng, b=b, d=d, lm_len=lm_len)
    tt = np.zeros((b, d, lm_len), dtype="int32")
    tt[..., 8:] = 2
    batch = batch.replace(lm__token_type_ids=jnp.asarray(tt))
    model = Seq2SeqRealm(
        cfg=_toy_cfg(),
        reader_cfg=T5EncoderConfig(
            vocab_size=100, hidden_size=32, num_layers=1, num_heads=2, head_dim=16,
            intermediate_size=64, relative_attention_num_buckets=8,
            relative_attention_max_distance=16, dtype=jnp.float32,
        ),
        gradients=VodGradients(alpha=0.5),
    )
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    m = evaluate_generation(model, params, [batch], max_new_tokens=4)
    assert set(m) == {"gen/exact_match", "gen/token_f1"}
    assert 0.0 <= m["gen/exact_match"] <= 1.0 and 0.0 <= m["gen/token_f1"] <= 1.0


@pytest.mark.slow
def test_realm_beam_generate() -> None:
    """Beam twin of realm_generate: shapes + finite scores, beam1 == greedy."""
    from vod_tpu.models.seq2seq import Seq2SeqRealm, realm_beam_generate, realm_generate
    from vod_tpu.models.t5_encoder import T5EncoderConfig

    rng = np.random.default_rng(31)
    b, d, lm_len, t = 2, 2, 10, 4
    batch = _toy_batch(rng, b=b, d=d, lm_len=lm_len)
    tt = np.zeros((b, d, lm_len), dtype="int32")
    tt[..., 7:] = 2
    batch = batch.replace(lm__token_type_ids=jnp.asarray(tt))
    model = Seq2SeqRealm(
        cfg=_toy_cfg(),
        reader_cfg=T5EncoderConfig(
            vocab_size=100, hidden_size=32, num_layers=1, num_heads=2, head_dim=16,
            intermediate_size=64, relative_attention_num_buckets=8,
            relative_attention_max_distance=16, dtype=jnp.float32,
        ),
        gradients=VodGradients(alpha=0.5),
    )
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    toks, scores = realm_beam_generate(model, params, batch, num_beams=3, max_new_tokens=t)
    assert np.asarray(toks).shape == (b * d, t)
    assert np.isfinite(np.asarray(scores)).all()
    b1, _ = realm_beam_generate(model, params, batch, num_beams=1, max_new_tokens=t)
    greedy = realm_generate(model, params, batch, max_new_tokens=t)
    assert np.array_equal(np.asarray(b1), np.asarray(greedy))


def test_filter_logits_topk_topp() -> None:
    """Top-k / nucleus logit filtering (HF sampler parity)."""
    from vod_tpu.models.seq2seq import filter_logits

    logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0, -1.0]])
    out = np.asarray(filter_logits(logits, top_k=2))
    assert np.isfinite(out[0, :2]).all() and np.isneginf(out[0, 2:]).all()
    # top_p: probs ~ [0.64, 0.23, 0.086, ...]; p=0.7 keeps tokens while the
    # mass BEFORE them is < 0.7 -> tokens 0 and 1
    out = np.asarray(filter_logits(logits, top_p=0.7))
    assert np.isfinite(out[0, :2]).all() and np.isneginf(out[0, 2:]).all()
    # p close to 1 keeps everything; k >= vocab keeps everything
    assert np.isfinite(np.asarray(filter_logits(logits, top_p=0.9999))).all()
    assert np.isfinite(np.asarray(filter_logits(logits, top_k=5))).all()
    # always at least one token survives even with tiny p
    out = np.asarray(filter_logits(logits, top_p=1e-9))
    assert np.isfinite(out[0, 0]) and np.isneginf(out[0, 1:]).all()


def test_sampled_generation_topk1_matches_greedy() -> None:
    """temperature>0 with top_k=1 must reproduce the greedy path exactly."""
    from vod_tpu.models.seq2seq import Seq2SeqLM, generate
    from vod_tpu.models.t5_encoder import T5EncoderConfig

    cfg = T5EncoderConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2, head_dim=16,
        intermediate_size=64,
    )
    model = Seq2SeqLM(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 64, size=(2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, ids[:, :4], jnp.ones((2, 4), jnp.int32))
    greedy = generate(model, params, ids, mask, max_new_tokens=6, temperature=0.0)
    topk1 = generate(
        model, params, ids, mask, max_new_tokens=6, temperature=0.8, top_k=1,
        rng=jax.random.PRNGKey(3),
    )
    assert np.array_equal(np.asarray(greedy), np.asarray(topk1))
    # nucleus sampling runs and emits valid token ids
    sampled = generate(
        model, params, ids, mask, max_new_tokens=6, temperature=1.0, top_p=0.9,
        rng=jax.random.PRNGKey(4),
    )
    assert np.asarray(sampled).shape == (2, 6)
    assert (np.asarray(sampled) >= 0).all() and (np.asarray(sampled) < 64).all()
