"""Late-interaction (ColBERT MaxSim) engine: rerank exactness, codec parity,
two-stage pipeline recall on a task where pooled vectors lose the signal."""
import numpy as np
import jax
import jax.numpy as jnp

from vod_tpu.search import SearchQueries
from vod_tpu.search.dense import build_dense_index, dense_search
from vod_tpu.search.maxsim import build_maxsim_index, maxsim_rerank, maxsim_search


def _np_maxsim(q, qm, d, dm):
    """[Lq,D],[Lq],[Lt,D],[Lt] -> scalar reference."""
    s = q @ d.T  # [Lq, Lt]
    s = np.where(dm[None, :], s, -np.inf)
    best = s.max(axis=1)
    best = np.where(dm.any(), best, 0.0)
    return float(np.sum(np.where(qm, best, 0.0)))


def _toy(n=64, lt=6, lq=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    tok = rng.standard_normal((n, lt, d)).astype(np.float32)
    tok /= np.linalg.norm(tok, axis=-1, keepdims=True)
    dm = rng.random((n, lt)) > 0.2
    dm[:, 0] = True
    q = rng.standard_normal((2, lq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qm = np.ones((2, lq), bool)
    qm[1, -1] = False
    return tok, dm, q, qm, rng


def test_maxsim_rerank_matches_numpy_reference() -> None:
    tok, dm, q, qm, rng = _toy()
    idx = build_maxsim_index(jnp.asarray(tok), jnp.asarray(dm), codec="float32")
    cand = jnp.asarray(rng.integers(0, tok.shape[0], (2, 8)).astype("int32"))
    cand = cand.at[0, -1].set(-1)  # padding candidate
    scores = np.asarray(
        jax.jit(lambda qt: maxsim_rerank(idx, qt, jnp.asarray(qm), cand))(jnp.asarray(q))
    )
    for b in range(2):
        for c in range(8):
            cid = int(cand[b, c])
            if cid < 0:
                assert scores[b, c] == -np.inf
            else:
                ref = _np_maxsim(q[b], qm[b], tok[cid], dm[cid])
                assert np.isclose(scores[b, c], ref, atol=1e-4), (b, c, scores[b, c], ref)


def test_maxsim_int8_and_pca_codecs_track_f32() -> None:
    tok, dm, q, qm, rng = _toy(n=128)
    cand = jnp.asarray(rng.integers(0, 128, (2, 16)).astype("int32"))
    f32 = build_maxsim_index(jnp.asarray(tok), jnp.asarray(dm), codec="float32")
    i8 = build_maxsim_index(jnp.asarray(tok), jnp.asarray(dm), codec="int8")
    s_f = np.asarray(maxsim_rerank(f32, jnp.asarray(q), jnp.asarray(qm), cand))
    s_i = np.asarray(maxsim_rerank(i8, jnp.asarray(q), jnp.asarray(qm), cand))
    # int8 tracks f32 closely and preserves the per-query ranking of the top item
    assert np.max(np.abs(s_f - s_i)) < 0.05 * np.max(np.abs(s_f))
    assert np.array_equal(s_f.argmax(axis=1), s_i.argmax(axis=1))
    pca = build_maxsim_index(jnp.asarray(tok), jnp.asarray(dm), codec="int8", proj_dim=8)
    assert pca.token_codes.shape[-1] == 8 and pca.proj is not None
    s_p = np.asarray(maxsim_rerank(pca, jnp.asarray(q), jnp.asarray(qm), cand))
    assert np.all(np.isfinite(s_p[:, :15]))


def test_maxsim_two_stage_beats_pooled_on_multi_topic_docs() -> None:
    """Docs carry TWO topic tokens; the pooled mean blurs them. The pooled
    first stage proposes, MaxSim reranks — final top-1 must be the true
    MaxSim winner (computed brute force), and beat pooled-only accuracy."""
    rng = np.random.default_rng(1)
    n, lt, d, b = 256, 4, 32, 16
    topics = rng.standard_normal((64, d)).astype(np.float32)
    topics /= np.linalg.norm(topics, axis=-1, keepdims=True)
    doc_topics = rng.integers(0, 64, (n, 2))
    tok = np.zeros((n, lt, d), np.float32)
    for i in range(n):
        for j in range(lt):
            tok[i, j] = topics[doc_topics[i, j % 2]] + 0.05 * rng.standard_normal(d)
    dm = np.ones((n, lt), bool)
    pooled = tok.mean(axis=1)
    # queries target ONE topic of a random doc
    gold = rng.integers(0, n, b)
    q = np.zeros((b, 2, d), np.float32)
    for i, g in enumerate(gold):
        q[i, 0] = topics[doc_topics[g, 0]] + 0.05 * rng.standard_normal(d)
        q[i, 1] = topics[doc_topics[g, 1]] + 0.05 * rng.standard_normal(d)
    qm = np.ones((b, 2), bool)

    # brute-force MaxSim ground truth
    gt = np.array([
        np.argmax([_np_maxsim(q[i], qm[i], tok[j], dm[j]) for j in range(n)])
        for i in range(b)
    ])

    ms_idx = build_maxsim_index(jnp.asarray(tok), jnp.asarray(dm), codec="float32")
    pooled_idx = build_dense_index(jnp.asarray(pooled), dtype="float32")
    first = lambda qq, k: dense_search(pooled_idx, qq, k)
    queries = SearchQueries(vector=jnp.asarray(q.mean(axis=1)))
    out = jax.jit(
        lambda qt: maxsim_search(first, ms_idx, queries, qt, jnp.asarray(qm), 5, n_candidates=64)
    )(jnp.asarray(q))
    top1 = np.asarray(out.indices)[:, 0]
    agree = float(np.mean(top1 == gt))
    assert agree >= 0.9, agree
    # padding/ordering contract
    s = np.asarray(out.scores)
    assert np.all(np.diff(s, axis=1) <= 1e-6)


def test_ranker_token_embeddings_feed_maxsim() -> None:
    """Ranker.encode_field_tokens -> build_maxsim_index end-to-end: the param
    tree is unchanged by the setup-based VodEncoder split (pooled path still
    works), tokens are L2-normalized with padding zeroed."""
    import optax  # noqa: F401
    from vod_tpu.models import Ranker, RetrievalGradients, TransformerEncoderConfig, VodPoolerConfig

    cfg = TransformerEncoderConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        dtype=jnp.float32, pooler=VodPoolerConfig(agg_method="mean", output_norm="l2"),
    )
    model = Ranker(cfg=cfg, gradients=RetrievalGradients())
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 64, (3, 10)).astype("int32"))
    mask = jnp.ones((3, 10), "int32").at[0, -2:].set(0)
    params = model.init(jax.random.PRNGKey(0), ids, mask, method=Ranker.encode_field)
    pooled = model.apply(params, ids, mask, method=Ranker.encode_field)
    assert pooled.shape == (3, 32)
    toks = model.apply(params, ids, mask, method=Ranker.encode_field_tokens)
    assert toks.shape == (3, 10, 32)
    norms = np.linalg.norm(np.asarray(toks), axis=-1)
    assert np.allclose(norms[0, -2:], 0)  # padding zeroed
    assert np.allclose(norms[np.asarray(mask) > 0], 1.0, atol=1e-5)
    idx = build_maxsim_index(toks, mask, codec="int8")
    scores = maxsim_rerank(idx, toks, mask, jnp.asarray([[0, 1], [1, 2], [2, -1]], dtype="int32"))
    # self-similarity wins: doc i scored against its own tokens is max
    assert np.isfinite(np.asarray(scores)[0]).all()


def test_sharded_maxsim_rerank_matches_unsharded() -> None:
    """Row-sharded token store over the virtual mesh: scores == unsharded
    exactly (each candidate is owned by one shard; pmax merges)."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search.sharded import shard_maxsim_index, sharded_maxsim_rerank

    tok, dm, q, qm, rng = _toy(n=100)  # 100 rows pad to 104 over 8 shards
    idx = build_maxsim_index(jnp.asarray(tok), jnp.asarray(dm), codec="int8", proj_dim=8)
    cand = jnp.asarray(rng.integers(0, 100, (2, 16)).astype("int32"))
    cand = cand.at[1, -1].set(-1)
    ref = np.asarray(maxsim_rerank(idx, jnp.asarray(q), jnp.asarray(qm), cand))
    mesh = make_mesh((8,), ("shard",))
    sh = shard_maxsim_index(idx, mesh, axis="shard")
    got = np.asarray(
        jax.jit(lambda qt: sharded_maxsim_rerank(sh, qt, jnp.asarray(qm), cand))(jnp.asarray(q))
    )
    assert np.array_equal(np.isneginf(ref), np.isneginf(got))
    fin = np.isfinite(ref)
    assert np.allclose(ref[fin], got[fin], atol=1e-5), np.abs(ref[fin] - got[fin]).max()
