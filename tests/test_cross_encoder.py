"""Cross-encoder reranker: HF port parity, rerank mechanics, trainability.

Beyond-reference model family (the reference has dual encoders only,
`vod_systems/ranker.py`); the rerank composes over any first-stage engine like
`maxsim_search` does.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vod_tpu.models.cross_encoder import (
    CrossEncoder,
    cross_encoder_rerank,
    listwise_rerank_loss,
    tokenize_pairs,
)
from vod_tpu.models.encoder import TransformerEncoderConfig
from vod_tpu.types.retrieval import RetrievalBatch

from .helpers import tiny_tokenizer


def _tiny_cfg(vocab=256):
    return TransformerEncoderConfig(
        vocab_size=vocab, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, dtype=jnp.float32,
    )


def test_rerank_orders_by_cross_scores_and_keeps_padding_last():
    cfg = _tiny_cfg()
    model = CrossEncoder(cfg)
    b, c, length = 2, 6, 12
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 256, (b, c, length)).astype(np.int32)
    mask = np.ones((b, c, length), np.int32)
    types = np.zeros((b, c, length), np.int32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids[0]), jnp.asarray(mask[0]), jnp.asarray(types[0])
    )["params"]

    cand = RetrievalBatch(
        scores=jnp.asarray(rng.standard_normal((b, c)), jnp.float32),
        indices=jnp.asarray([[3, 9, 4, -1, 7, -1], [5, 2, 8, 1, -1, -1]], jnp.int32),
    )

    def apply_fn(p, i, m, t):
        return model.apply({"params": p}, i, m, t)

    out = jax.jit(
        lambda p, cnd, i, m, t: cross_encoder_rerank(
            apply_fn, p, cnd, i, m, t, top_k=4, chunk=4
        )
    )(params, cand, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types))

    assert out.indices.shape == (2, 4)
    # padded candidates (-1) never outrank real ones
    real_counts = [4, 4]
    for i, n_real in enumerate(real_counts):
        got = np.asarray(out.indices[i])
        assert (got[: min(n_real, 4)] >= 0).all()
    # scores are the model's, sorted descending where finite
    s = np.asarray(out.scores)
    for row in s:
        fin = row[np.isfinite(row)]
        assert (np.diff(fin) <= 1e-6).all()


def test_listwise_loss_masks_and_averages():
    scores = jnp.asarray([[2.0, 1.0, 0.0], [5.0, -1.0, 3.0]])
    labels = jnp.asarray([[1, 0, -1], [0, -1, 0]])  # row 2 has no positive
    loss = listwise_rerank_loss(scores, labels)
    # only row 1 contributes: -log softmax([2,1])[0]
    expect = -np.log(np.exp(2.0) / (np.exp(2.0) + np.exp(1.0)))
    assert float(loss) == pytest.approx(expect, rel=1e-5)


def test_cross_encoder_trains_to_separate_pairs():
    """A tiny cross-encoder learns token-overlap relevance the dual encoder
    cannot express per-pair: positives share a marker token with the query."""
    import optax

    cfg = _tiny_cfg(vocab=64)
    model = CrossEncoder(cfg)
    rng = np.random.default_rng(1)
    b, c, length = 8, 4, 10

    def make_batch(seed):
        r = np.random.default_rng(seed)
        ids = r.integers(10, 60, (b, c, length)).astype(np.int32)
        labels = np.zeros((b, c), np.int32)
        pos = r.integers(0, c, b)
        marker = r.integers(1, 10, b)  # low-token markers
        for i in range(b):
            ids[i, :, 0] = marker[i]  # "query" token visible in every pair
            ids[i, pos[i], 1] = marker[i]  # positive repeats it
            labels[i, pos[i]] = 1
        return jnp.asarray(ids), jnp.asarray(labels)

    ids0, _ = make_batch(0)
    mask = jnp.ones((b, c, length), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), ids0[0], mask[0], None
    )["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, ids, labels):
        def loss_fn(p):
            flat = ids.reshape(b * c, length)
            s = model.apply({"params": p}, flat, mask.reshape(b * c, length))
            return listwise_rerank_loss(s.reshape(b, c), labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(30):
        ids, labels = make_batch(i % 5)
        params, opt_state, loss = step(params, opt_state, ids, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_tokenize_pairs_shapes_and_segments():
    tok = tiny_tokenizer()
    out = tokenize_pairs(
        tok,
        ["what is the capital of france", "who jumps over the dog"],
        [["paris is the capital", "tokyo city"], ["the quick brown fox", "lazy dog"]],
        max_length=16,
    )
    assert out["input_ids"].shape == (2, 2, 16)
    assert out["attention_mask"].shape == (2, 2, 16)
    # segment ids: query tokens 0, section tokens 1
    tt = out["token_type_ids"]
    assert tt.shape == (2, 2, 16)
    assert tt[0, 0, 0] == 0 and tt.max() == 1


@pytest.mark.slow
def test_bert_classifier_port_parity():
    import torch
    import transformers

    from vod_tpu.models.cross_encoder import port_bert_cross_encoder_weights
    from vod_tpu.models.hf_import import config_from_hf

    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        num_labels=1,
    )
    tmodel = transformers.BertForSequenceClassification(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params = port_bert_cross_encoder_weights(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (3, 12)).astype("int64")
    mask = np.ones((3, 12), "int64")
    mask[2, 8:] = 0
    types = np.zeros((3, 12), "int64")
    types[:, 6:] = 1

    with torch.no_grad():
        ref = tmodel(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            token_type_ids=torch.from_numpy(types),
        ).logits.numpy()[:, 0]

    got = CrossEncoder(cfg).apply(
        {"params": params},
        jnp.asarray(ids.astype("int32")),
        jnp.asarray(mask.astype("int32")),
        jnp.asarray(types.astype("int32")),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)
