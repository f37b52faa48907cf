"""GradCache (Gao et al. 2021, arXiv:2101.06983) — beyond reference.

The chunked two-pass backward must reproduce the monolithic step's gradients
EXACTLY (same reassociation class as grad accumulation): pass-1 encodes in
chunks without retaining activations, pass-2 differentiates the estimator loss
over the pooled [rows, H] encodings only, pass-3 pulls the cached cotangents
back through per-chunk VJPs. These tests pin gradient equality against
`jax.value_and_grad` of the fused loss across layouts (nested sections,
flat in-batch-negative pools, row counts not divisible by the chunk size),
through the MoE sowed aux loss, and through the `RealmTrainStep` integration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vod_tpu.models import (
    Ranker,
    RetrievalGradients,
    TransformerEncoderConfig,
    VodPoolerConfig,
)
from vod_tpu.runtime import DeviceCorpus, QueryBatch, device_collate
from vod_tpu.runtime.gradcache import gradcache_value_and_grad
from vod_tpu.runtime.train import make_train_step
from vod_tpu.search import HybridEngines, build_dense_index

VOCAB = 64


def _cfg(**kw):
    return TransformerEncoderConfig(
        vocab_size=VOCAB, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, dtype=jnp.float32,
        pooler=VodPoolerConfig(agg_method="mean", output_norm="l2", scaler=8.0),
        **kw,
    )


def _task(b=4, n_corpus=64, in_batch_negatives=False, cfg=None):
    """Model + params + one collated RealmBatch (real retrieval layout)."""
    rng = np.random.default_rng(0)
    sec = rng.integers(4, VOCAB, size=(n_corpus, 8)).astype("int32")
    corpus = DeviceCorpus(
        input_ids=jnp.asarray(sec), attention_mask=jnp.ones((n_corpus, 8), "int32")
    )
    queries = QueryBatch(
        input_ids=jnp.asarray(rng.integers(4, VOCAB, size=(b, 6)).astype("int32")),
        attention_mask=jnp.ones((b, 6), "int32"),
        section_ids=jnp.asarray(rng.integers(0, n_corpus, size=(b, 1)).astype("int32")),
    )
    model = Ranker(cfg=cfg or _cfg(), gradients=RetrievalGradients())
    emb = jnp.asarray(rng.normal(size=(n_corpus, 32)).astype("float32"))
    engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"))
    batch, _ = jax.jit(
        lambda k, qv: device_collate(
            k, engines, corpus, queries, query_vectors=qv, prefetch=16,
            n_sections=4, max_pos_sections=1, in_batch_negatives=in_batch_negatives,
        )
    )(jax.random.PRNGKey(0), jnp.asarray(rng.normal(size=(b, 32)).astype("float32")))
    params = model.init(jax.random.PRNGKey(1), batch, mode="evaluate")
    return model, params, batch


# RealmOutput.diagnostics is STATIC metadata — returning the full output from
# jit would leak tracers through the treedef, so both helpers return
# (loss, retriever_scores, grads), exactly what `RealmTrainStep` extracts.
def _monolithic(model, params, batch):
    @jax.jit
    def run(p, b):
        def loss_fn(p):
            out, aux_vars = model.apply(p, b, mode="evaluate", mutable=["losses"])
            aux = sum(jnp.sum(v) for v in jax.tree.leaves(aux_vars.get("losses", {})))
            return out.loss + aux, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        return loss, out.retriever_scores, grads

    return run(params, batch)


def _cached(model, params, batch, chunk_rows):
    @jax.jit
    def run(p, b):
        (loss, out), grads = gradcache_value_and_grad(model, p, b, chunk_rows=chunk_rows)
        return loss, out.retriever_scores, grads

    return run(params, batch)


def _assert_tree_close(a, b, atol=2e-5):
    flat_a, flat_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=atol, rtol=1e-4)


@pytest.mark.parametrize("chunk_rows", [8, 12])  # 12 does not divide 20 rows -> padding
def test_gradcache_matches_monolithic_gradients(chunk_rows):
    model, params, batch = _task(b=4)  # rows = 4 queries + 16 sections = 20
    loss_m, scores_m, grads_m = _monolithic(model, params, batch)
    loss_c, scores_c, grads_c = _cached(model, params, batch, chunk_rows)
    np.testing.assert_allclose(float(loss_c), float(loss_m), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scores_c), np.asarray(scores_m), atol=1e-5)
    _assert_tree_close(grads_c, grads_m)


def test_gradcache_flat_inbatch_negative_pool():
    """The flat [U, H] shared-pool layout (in-batch negatives) reshapes
    differently in the loss — gradients must still match."""
    model, params, batch = _task(b=4, in_batch_negatives=True)
    assert batch.extras.get("flat_sections", False)
    loss_m, _, grads_m = _monolithic(model, params, batch)
    loss_c, _, grads_c = _cached(model, params, batch, 8)
    np.testing.assert_allclose(float(loss_c), float(loss_m), atol=1e-5, rtol=1e-5)
    _assert_tree_close(grads_c, grads_m)


def test_gradcache_moe_aux_loss_flows():
    """Sowed MoE aux losses accumulate per chunk in pass-1 and backprop
    through pass-3 (aux cotangent 1.0). The load-balance loss is a BATCH
    statistic (product of router means), so per-chunk aux is a different —
    equally valid — regularizer than the fused pass's (exactly as under grad
    accumulation). The exactness claim is therefore against plain autodiff of
    the SAME chunked program, which must match to float tolerance."""
    from vod_tpu.runtime.gradcache import _fused_rows

    cfg = _cfg(moe_experts=2, moe_top_k=1, moe_aux_weight=1e-2)
    model, params, batch = _task(b=4, cfg=cfg)
    chunk_rows = 8

    @jax.jit
    def ref(p, b):
        """Autodiff straight through the chunked forward (activations kept)."""
        ids, mask, nq = _fused_rows(b)
        rows = ids.shape[0]
        n_chunks = -(-rows // chunk_rows)
        pad = n_chunks * chunk_rows - rows
        ids_p = jnp.pad(ids, ((0, pad), (0, 0)))
        mask_p = jnp.pad(mask, ((0, pad), (0, 0)))
        mask_p = mask_p.at[rows:, 0].set(1) if pad else mask_p

        def loss_fn(p):
            aux_total, encs = jnp.float32(0.0), []
            for c in range(n_chunks):
                sl = slice(c * chunk_rows, (c + 1) * chunk_rows)
                pooled, aux_vars = model.apply(
                    p, ids_p[sl], mask_p[sl],
                    method=type(model).encode_field, mutable=["losses"],
                )
                aux_total += sum(jnp.sum(v) for v in jax.tree.leaves(aux_vars["losses"]))
                encs.append(pooled)
            e = jnp.concatenate(encs)[:rows]
            q_enc, s_enc = e[:nq], e[nq:].reshape(nq, -1, e.shape[-1])
            out = model.gradients(batch=b, query_encoding=q_enc, section_encoding=s_enc)
            return out.loss + aux_total

        return jax.value_and_grad(loss_fn)(p)

    loss_r, grads_r = ref(params, batch)
    loss_c, _, grads_c = _cached(model, params, batch, chunk_rows)
    np.testing.assert_allclose(float(loss_c), float(loss_r), atol=1e-5, rtol=1e-5)
    _assert_tree_close(grads_c, grads_r, atol=5e-5)
    router = [
        np.abs(np.asarray(v)).max()
        for k, v in jax.tree_util.tree_leaves_with_path(grads_c)
        if "moe" in jax.tree_util.keystr(k)
    ]
    assert router and max(router) > 0.0


def test_train_step_with_gradcache_matches_plain_step():
    """`RealmTrainStep(gradcache_chunk_rows=...)` produces the same parameter
    update as the monolithic step (same rng, same init)."""
    rng = np.random.default_rng(0)
    n_corpus = 64
    sec = rng.integers(4, VOCAB, size=(n_corpus, 8)).astype("int32")
    corpus = DeviceCorpus(
        input_ids=jnp.asarray(sec), attention_mask=jnp.ones((n_corpus, 8), "int32")
    )
    queries = QueryBatch(
        input_ids=jnp.asarray(rng.integers(4, VOCAB, size=(4, 6)).astype("int32")),
        attention_mask=jnp.ones((4, 6), "int32"),
        section_ids=jnp.asarray(rng.integers(0, n_corpus, size=(4, 1)).astype("int32")),
    )
    model = Ranker(cfg=_cfg(), gradients=RetrievalGradients())
    emb = jnp.asarray(rng.normal(size=(n_corpus, 32)).astype("float32"))
    engines = HybridEngines(dense=build_dense_index(emb, dtype="float32"))

    results = {}
    for name, chunk in [("plain", None), ("cache", 8)]:
        # sgd: the param delta is proportional to the grad delta (adam's
        # sqrt(v) normalization would amplify float reassociation noise to
        # O(lr) regardless of how close the grads are)
        tx = optax.sgd(1e-2)
        step = make_train_step(
            model, tx, prefetch=16, n_sections=4, max_pos_sections=1,
            gradient_clip_val=1.0, gradcache_chunk_rows=chunk,
        )
        # dense engine absent -> _collate embeds queries live; give it one
        p = model.init(jax.random.PRNGKey(1),
                       *(lambda b: (b,))(_task()[2]), mode="evaluate")
        o = tx.init(p)
        p2, _, m, _, _ = step.train_step(
            p, o, engines, corpus, queries, jax.random.PRNGKey(2), {}
        )
        results[name] = (p2, float(m["loss"]))
    np.testing.assert_allclose(results["cache"][1], results["plain"][1], atol=1e-5, rtol=1e-5)
    _assert_tree_close(results["cache"][0], results["plain"][0], atol=5e-6)


def test_gradcache_rejects_lm_systems():
    model = Ranker(cfg=_cfg(), gradients=RetrievalGradients())
    with pytest.raises(ValueError, match="retriever-only"):
        make_train_step(model, optax.adam(1e-3), with_lm=True, gradcache_chunk_rows=8)
