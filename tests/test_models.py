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
