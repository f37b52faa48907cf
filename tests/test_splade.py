"""SPLADE learned-sparse engine: head parity vs torch, impact-index inversion
correctness vs brute force, and end-to-end ranker trainability.

Beyond-reference family (the reference's sparse path is BM25-only via
Elasticsearch, `src/vod_search/es_search/`); the learned impacts serve through
the SAME device postings engine (`search/sparse.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vod_tpu.models.encoder import TransformerEncoderConfig
from vod_tpu.models.splade import (
    SpladeEncoder,
    flops_loss,
    port_splade_weights,
    splade_topk_terms,
)
from vod_tpu.search.base import SearchQueries
from vod_tpu.search.sparse import build_impact_index, sparse_search


def _tiny_cfg(vocab=256):
    return TransformerEncoderConfig(
        vocab_size=vocab, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, dtype=jnp.float32,
    )


def test_splade_impacts_nonnegative_and_padding_invariant():
    cfg = _tiny_cfg()
    model = SpladeEncoder(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 256, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    mask[:, 7:] = 0
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))["params"]

    imp = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    assert imp.shape == (2, 256)
    assert (np.asarray(imp) >= 0).all()

    # changing token ids under the padding mask must not change the impacts
    ids2 = ids.copy()
    ids2[:, 7:] = rng.integers(5, 256, (2, 3))
    imp2 = model.apply({"params": params}, jnp.asarray(ids2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(imp), np.asarray(imp2), rtol=1e-6)


def test_splade_topk_terms_pads_zero_impacts():
    imp = jnp.asarray([[0.0, 2.0, 0.0, 1.0], [0.0, 0.0, 0.0, 0.0]])
    terms, weights = splade_topk_terms(imp, 3)
    assert terms.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(terms[0]), [1, 3, -1])
    np.testing.assert_allclose(np.asarray(weights[0]), [2.0, 1.0, 0.0])
    assert (np.asarray(terms[1]) == -1).all()
    assert (np.asarray(weights[1]) == 0.0).all()


def test_splade_head_matches_torch_masked_lm():
    """Port a random torch BertForMaskedLM; impacts must match
    max_t log1p(relu(logits)) over valid tokens exactly."""
    import torch
    import transformers

    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
    )
    tmodel = transformers.BertForMaskedLM(hf_cfg).eval()

    from vod_tpu.models.hf_import import config_from_hf

    cfg = config_from_hf(hf_cfg)
    params = port_splade_weights(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(5, 128, (3, 12)).astype(np.int64)
    mask = np.ones((3, 12), np.int64)
    mask[:, 9:] = 0

    with torch.no_grad():
        logits = tmodel(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).logits.numpy()
    acts = np.log1p(np.maximum(logits, 0.0)) * mask[..., None]
    expect = acts.max(axis=1)

    model = SpladeEncoder(cfg)
    got = model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-4, rtol=1e-3)


def test_impact_index_search_matches_bruteforce_dot():
    """build_impact_index + sparse_search == dense dot product of the sparse
    vocab vectors when no truncation bites."""
    rng = np.random.default_rng(2)
    n_docs, n_terms, k_doc, b, k_query = 40, 64, 8, 5, 6

    doc_terms = np.stack([rng.choice(n_terms, size=k_doc, replace=False) for _ in range(n_docs)])
    doc_w = rng.uniform(0.1, 2.0, (n_docs, k_doc)).astype(np.float32)
    # sprinkle padding
    doc_terms[:, -1] = -1
    q_terms = np.stack([rng.choice(n_terms, size=k_query, replace=False) for _ in range(b)])
    q_w = rng.uniform(0.1, 2.0, (b, k_query)).astype(np.float32)

    # dense brute force in vocab space
    dv = np.zeros((n_docs, n_terms), np.float32)
    for i in range(n_docs):
        for j in range(k_doc):
            if doc_terms[i, j] >= 0:
                dv[i, doc_terms[i, j]] += doc_w[i, j]
    qv = np.zeros((b, n_terms), np.float32)
    for i in range(b):
        for j in range(k_query):
            qv[i, q_terms[i, j]] += q_w[i, j]
    expect = qv @ dv.T  # [B, N]

    index = build_impact_index(doc_terms, doc_w, n_terms=n_terms, max_postings=n_docs)
    out = sparse_search(
        index,
        SearchQueries(terms=jnp.asarray(q_terms, jnp.int32), term_weights=jnp.asarray(q_w)),
        top_k=10,
    )
    scores, idx = np.asarray(out.scores), np.asarray(out.indices)
    for i in range(b):
        order = np.argsort(-expect[i])
        hits = order[expect[i][order] > 0][:10]
        got = idx[i][idx[i] >= 0]
        assert len(got) == len(hits)
        np.testing.assert_array_equal(np.sort(got), np.sort(hits))
        for rank, d in enumerate(got):
            np.testing.assert_allclose(scores[i][rank], expect[i, d], rtol=1e-5)
        assert got[0] == hits[0]  # top-1 agrees exactly


def test_impact_index_truncation_keeps_highest_impacts():
    """max_postings truncation keeps the highest-impact docs per term
    (impact-ordered pruning, same convention as the BM25 build)."""
    doc_terms = np.asarray([[0], [0], [0], [1]])
    doc_w = np.asarray([[1.0], [3.0], [2.0], [5.0]], np.float32)
    index = build_impact_index(doc_terms, doc_w, n_terms=2, max_postings=2)
    docs = np.asarray(index.postings_docs)
    imps = np.asarray(index.postings_impacts)
    np.testing.assert_array_equal(docs[0], [1, 2])  # docs with w=3, 2 survive
    np.testing.assert_allclose(imps[0], [3.0, 2.0])
    np.testing.assert_array_equal(docs[1], [3, -1])


def test_splade_pipeline_end_to_end_matches_bruteforce():
    """Full learned-sparse serving path: chunked corpus encode (top-k on
    device) -> build_impact_index -> sparse_search == brute-force dot of the
    same sparsified impact vectors."""
    cfg = _tiny_cfg(vocab=128)
    model = SpladeEncoder(cfg)
    rng = np.random.default_rng(4)
    n, length, k_doc, k_query = 30, 10, 16, 8
    c_ids = rng.integers(5, 128, (n, length)).astype(np.int32)
    c_mask = np.ones((n, length), np.int32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(c_ids[:2]), jnp.asarray(c_mask[:2]))["params"]

    def apply_fn(p, i, m):
        return model.apply({"params": p}, i, m)

    from vod_tpu.models.splade import encode_corpus_terms

    terms, weights = encode_corpus_terms(
        apply_fn, params, jnp.asarray(c_ids), jnp.asarray(c_mask), k=k_doc, chunk=8
    )
    assert terms.shape == (n, k_doc)
    index = build_impact_index(terms, weights, n_terms=128, max_postings=n)

    q_ids = rng.integers(5, 128, (3, length)).astype(np.int32)
    q_mask = np.ones((3, length), np.int32)
    q_imp = apply_fn(params, jnp.asarray(q_ids), jnp.asarray(q_mask))
    q_terms, q_weights = splade_topk_terms(q_imp, k_query)

    out = sparse_search(index, SearchQueries(terms=q_terms, term_weights=q_weights), top_k=5)

    # brute force over the SAME sparsified vectors
    dv = np.zeros((n, 128), np.float32)
    rows = np.repeat(np.arange(n), k_doc)
    keep = terms.ravel() >= 0
    dv[rows[keep], terms.ravel()[keep]] = weights.ravel()[keep]
    qv = np.zeros((3, 128), np.float32)
    qt, qw = np.asarray(q_terms), np.asarray(q_weights)
    rows = np.repeat(np.arange(3), k_query)
    keep = qt.ravel() >= 0
    qv[rows[keep], qt.ravel()[keep]] = qw.ravel()[keep]
    expect = qv @ dv.T

    idx, scores = np.asarray(out.indices), np.asarray(out.scores)
    for i in range(3):
        best = np.argsort(-expect[i])[:5]
        got = idx[i][idx[i] >= 0]
        if expect[i, best[0]] > 0:
            assert got[0] == best[0]
            np.testing.assert_allclose(scores[i, 0], expect[i, best[0]], rtol=1e-4)


@pytest.mark.slow
def test_splade_config_driven_periodic_training():
    """SPLADE end-to-end through the CLI path: live learned-sparse retrieval
    (query terms from the current encoder) + per-period impact reindexing
    (dense engine disabled)."""
    from vod_tpu.exps.cli import run_experiment
    from vod_tpu.exps.structconf import Experiment
    from tests.helpers import tiny_tokenizer
    from tests.test_exps import _toy_data

    tok = tiny_tokenizer()
    sections, queries = _toy_data()
    exp = Experiment.parse({
        "model": {
            "kind": "ranker", "gradients": "retrieval",
            "splade_encoder": True, "splade_flops_weight": 1e-4,
            "splade_query_k": 16, "splade_doc_k": 24,
            "vocab_size": tok.vocab_size, "hidden_size": 32, "num_layers": 1,
            "num_heads": 2, "intermediate_size": 64,
        },
        "tokenizer": {"max_length": 24},
        "collate": {"prefetch_n_sections": 16, "n_sections": 4, "max_pos_sections": 1},
        "dataloader": {"batch_size": 8},
        "trainer": {
            "max_steps": 8, "period": 4, "log_interval": 2,
            "learning_rate": 3e-3,
            "parameters": {"sparse": {"mode": "constant", "value": 1.0}},
        },
    })
    logs = []
    out = run_experiment(
        exp, sections=sections, queries=queries, tokenizer=tok,
        on_log=lambda s, m: logs.append((s, m)),
    )
    assert out["state"].step == 8
    assert len(out["history"]) == 2  # two periods -> two impact reindexes
    train_logs = [m for _, m in logs if "loss" in m]
    assert train_logs and np.isfinite(train_logs[-1]["loss"])


def test_flops_loss_zero_iff_inactive():
    imp = jnp.zeros((4, 8))
    assert float(flops_loss(imp)) == 0.0
    imp2 = imp.at[:, 3].set(1.0)
    assert float(flops_loss(imp2)) == pytest.approx(1.0)


def test_splade_ranker_trains_and_sows_flops_loss():
    """Ranker(splade_encoder=True): loss finite, FLOPS aux collected via
    mutable=['losses'], gradients reach the MLM-head transform."""
    from vod_tpu.models.gradients import RetrievalGradients
    from vod_tpu.models.systems import Ranker
    from vod_tpu.types import RealmBatch

    rng = np.random.default_rng(3)
    b, d, lq, ls = 2, 4, 8, 8
    scores = rng.normal(size=(b, d)).astype("float32")
    rel = np.zeros((b, d), dtype="float32")
    rel[:, 0] = 1.0
    lw = np.log(np.full((b, d), 1.0 / d, dtype="float32"))
    batch = RealmBatch(
        query__input_ids=jnp.asarray(rng.integers(5, 256, size=(b, lq)).astype("int32")),
        query__attention_mask=jnp.ones((b, lq), dtype="int32"),
        section__input_ids=jnp.asarray(rng.integers(5, 256, size=(b * d, ls)).astype("int32")),
        section__attention_mask=jnp.ones((b * d, ls), dtype="int32"),
        section__relevance=jnp.asarray(rel),
        section__idx=jnp.asarray(rng.integers(0, 1000, size=(b, d)).astype("int32")),
        section__score=jnp.asarray(scores),
        section__sparse=jnp.asarray(rng.normal(size=(b, d)).astype("float32")),
        section__dense=jnp.asarray(rng.normal(size=(b, d)).astype("float32")),
        section__log_weight=jnp.asarray(lw),
        section__lse_pos=jnp.zeros((b,), dtype="float32"),
        section__lse_neg=jnp.zeros((b,), dtype="float32"),
    )

    cfg = _tiny_cfg()
    model = Ranker(
        cfg=cfg, gradients=RetrievalGradients(), splade_encoder=True,
        splade_flops_weight=1e-3,
    )
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    def loss_fn(p):
        out, aux = model.apply({"params": p}, batch, mutable=["losses"])
        aux_sum = sum(jnp.sum(v) for v in jax.tree.leaves(aux.get("losses", {})))
        return out.loss + aux_sum, aux_sum

    (loss, aux_sum), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert float(aux_sum) > 0.0  # FLOPS regularizer active
    g = grads["encoder"]["transform"]["kernel"]
    assert float(jnp.abs(g).max()) > 0.0
