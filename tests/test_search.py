"""Search-engine tests: brute-force parity, filtering, sharding, hybrid composition.

These add what the reference never had (SURVEY §4): an in-memory backend driven on a
virtual 8-device CPU mesh exercising shard/merge/collective logic.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vod_tpu.search import (
    HybridEngines,
    SearchQueries,
    build_dense_index,
    build_pq_index,
    build_sharded_dense_index,
    build_sparse_index,
    hybrid_search,
    hybrid_search_and_sample,
    lookup_search,
    sharded_dense_search,
    sparse_search,
)
from vod_tpu.search.dense import dense_search, pq_search


def _corpus(rng: np.random.Generator, n: int, d: int) -> np.ndarray:
    x = rng.normal(size=(n, d)).astype("float32")
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_flat_search_matches_bruteforce() -> None:
    rng = np.random.default_rng(0)
    n, d, b, k = 1000, 64, 4, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_dense_index(jnp.asarray(corpus), dtype="float32")
    out = dense_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    # same id set (ties may reorder)
    for i in range(b):
        assert set(got[i].tolist()) == set(expected[i].tolist())
    scores = np.asarray(out.scores)
    assert np.allclose(np.sort(scores[0])[::-1], scores[0])


def test_flat_search_bf16_high_recall() -> None:
    rng = np.random.default_rng(1)
    n, d, b, k = 2000, 64, 8, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_dense_index(jnp.asarray(corpus), dtype="bfloat16")
    out = dense_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    recall = np.mean([len(set(got[i]) & set(expected[i])) / k for i in range(b)])
    assert recall >= 0.9, recall


def test_int8_search_high_recall() -> None:
    rng = np.random.default_rng(2)
    n, d, b, k = 2000, 64, 8, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_dense_index(jnp.asarray(corpus), dtype="int8")
    out = dense_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    recall = np.mean([len(set(got[i]) & set(expected[i])) / k for i in range(b)])
    assert recall >= 0.8, recall


def test_subset_filtering() -> None:
    rng = np.random.default_rng(3)
    n, d, b, k = 500, 32, 3, 20
    corpus = _corpus(rng, n, d)
    subsets = rng.integers(0, 5, size=n).astype("int32")
    q = _corpus(rng, b, d)
    allowed = jnp.asarray([[0, 1, -1], [2, -1, -1], [-1, -1, -1]], dtype="int32")
    index = build_dense_index(jnp.asarray(corpus), subset_ids=jnp.asarray(subsets), dtype="float32")
    out = dense_search(index, SearchQueries(vector=jnp.asarray(q), subset_ids=allowed), top_k=k)
    got_i = np.asarray(out.indices)
    got_s = np.asarray(out.scores)
    # query 0: only subsets {0,1}; query 1: only {2}; query 2: unfiltered
    for j, x in enumerate(got_i[0]):
        if x >= 0:
            assert subsets[x] in (0, 1)
    for x in got_i[1]:
        if x >= 0:
            assert subsets[x] == 2
    assert np.all(got_i[2] >= 0)
    assert np.all(np.isfinite(got_s[2]))


@pytest.mark.slow
def test_pq_search_recall() -> None:
    rng = np.random.default_rng(4)
    n, d, b, k = 4000, 64, 8, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_pq_index(
        jax.random.PRNGKey(0),
        jnp.asarray(corpus),
        n_subquantizers=32,
        coarse_dim=32,
        n_candidates=512,
        kmeans_iters=5,
    )
    out = pq_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    recall = np.mean([len(set(got[i]) & set(expected[i])) / k for i in range(b)])
    assert recall >= 0.7, recall  # i.i.d. gaussian data is PQ's worst case


def test_sharded_search_matches_unsharded() -> None:
    devices = jax.devices()
    assert len(devices) == 8, "tests require the 8-device virtual CPU mesh"
    from vod_tpu.parallel import make_mesh
    mesh = make_mesh((8,), ("shard",))
    rng = np.random.default_rng(5)
    n, d, b, k = 3000, 32, 4, 12
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    sharded = build_sharded_dense_index(jnp.asarray(corpus), mesh, dtype="float32")
    out = sharded_dense_search(sharded, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=128)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    for i in range(b):
        assert set(got[i].tolist()) == set(expected[i].tolist()), i


def test_sharded_multi_corpus_routing() -> None:
    from vod_tpu.parallel import make_mesh
    mesh = make_mesh((8,), ("shard",))
    rng = np.random.default_rng(6)
    n, d, b, k = 800, 16, 4, 5
    corpus = _corpus(rng, n, d)
    corpus_shard = (np.arange(n) % 2).astype("int32")  # two interleaved corpora
    q = _corpus(rng, b, d)
    route = jnp.asarray([0, 1, 0, -1], dtype="int32")  # -1 = search everything
    index = build_sharded_dense_index(
        jnp.asarray(corpus), mesh, dtype="float32", corpus_shard=jnp.asarray(corpus_shard)
    )
    out = sharded_dense_search(index, SearchQueries(vector=jnp.asarray(q), shard=route), top_k=k, chunk=128)
    got = np.asarray(out.indices)
    for j, x in enumerate(got[0]):
        assert x < 0 or corpus_shard[x] == 0
    for x in got[1]:
        assert x < 0 or corpus_shard[x] == 1
    assert np.all(got[3] >= 0)


def _toy_docs() -> list[list[int]]:
    # term ids; doc 0 about {1,2}, doc 1 about {2,3}, doc 2 about {7}, doc 3 mixes
    return [
        [1, 2, 2, 2],
        [2, 3, 3],
        [7, 7, 7, 7],
        [1, 3, 7],
        [9],
    ]


def test_bm25_scoring_vs_reference_formula() -> None:
    docs = _toy_docs()
    index = build_sparse_index(docs, max_postings=16)
    q = SearchQueries(terms=jnp.asarray([[2, 3, -1]], dtype="int32"))
    out = sparse_search(index, q, top_k=5)
    got_i = np.asarray(out.indices)[0]
    got_s = np.asarray(out.scores)[0]

    # numpy BM25 reference
    k1, b = 1.2, 0.75
    n_docs = len(docs)
    lens = np.asarray([len(x) for x in docs], dtype="float64")
    avgdl = lens.mean()

    def bm25(term: int, d: int) -> float:
        tf = docs[d].count(term)
        if tf == 0:
            return 0.0
        df = sum(1 for dd in docs if term in dd)
        idf = np.log(1 + (n_docs - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * lens[d] / avgdl))

    expected = {d: bm25(2, d) + bm25(3, d) for d in range(n_docs)}
    expected = {d: s for d, s in expected.items() if s > 0}
    got = {int(i): float(s) for i, s in zip(got_i, got_s) if i >= 0}
    assert set(got) == set(expected)
    for d in expected:
        assert np.isclose(got[d], expected[d], atol=1e-4), (d, got[d], expected[d])


def test_lookup_engine() -> None:
    q = SearchQueries(section_ids=jnp.asarray([[3, 9, -1], [-1, -1, -1]], dtype="int32"))
    out = lookup_search(q)
    assert np.asarray(out.scores)[0, 0] == 0.0
    assert np.asarray(out.labels)[0, 1] == 1
    assert np.all(np.isneginf(np.asarray(out.scores)[1]))
    assert np.all(np.asarray(out.labels)[1] == -1)


def test_hybrid_search_and_sample_end_to_end() -> None:
    """Dense + sparse + lookup fused, jitted, with traced engine weights."""
    rng = np.random.default_rng(7)
    n, d, b = 600, 32, 4
    corpus = _corpus(rng, n, d)
    docs = [[int(t) for t in rng.integers(0, 50, size=rng.integers(3, 10))] for _ in range(n)]
    engines = HybridEngines(
        dense=build_dense_index(jnp.asarray(corpus), dtype="float32"),
        sparse=build_sparse_index(docs, max_postings=256),
    )
    gold = np.stack([rng.choice(n, 3, replace=False) for _ in range(b)]).astype("int32")
    queries = SearchQueries(
        vector=jnp.asarray(_corpus(rng, b, d)),
        terms=jnp.asarray(rng.integers(0, 50, size=(b, 6)).astype("int32")),
        section_ids=jnp.asarray(gold),
    )

    @jax.jit
    def run(key, w_dense, w_sparse):
        return hybrid_search_and_sample(
            key, engines, queries,
            prefetch=32, total=8, max_pos_sections=2,
            weights={"dense": w_dense, "sparse": w_sparse},
        )

    sampled, merged = run(jax.random.PRNGKey(0), jnp.float32(1.0), jnp.float32(0.5))
    idx = np.asarray(sampled.batch.indices)
    lab = np.asarray(sampled.batch.labels)
    assert idx.shape == (b, 8)
    assert not np.any(np.isnan(np.asarray(sampled.log_weights)))
    # sampled positives must be gold ids
    for i in range(b):
        for j in range(8):
            if lab[i, j] == 1 and idx[i, j] >= 0:
                assert idx[i, j] in set(gold[i].tolist())
    # raw score channels exist for both engines
    assert set(sampled.raw_scores) == {"dense", "sparse"}
    # merged carries labels for gold ids
    ml = np.asarray(merged.labels)
    mi = np.asarray(merged.indices)
    for i in range(b):
        lab_map = {int(x): int(l) for x, l in zip(mi[i], ml[i]) if x >= 0}
        for g in gold[i]:
            assert lab_map.get(int(g), -99) == 1


def test_ivf_search_recall() -> None:
    from vod_tpu.search import build_ivf_index
    from vod_tpu.search.dense import ivf_search

    rng = np.random.default_rng(8)
    n, d, b, k = 3000, 32, 6, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_ivf_index(
        jax.random.PRNGKey(0), jnp.asarray(corpus), n_clusters=32, nprobe=8, kmeans_iters=5
    )
    out = ivf_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    recall = np.mean([len(set(got[i]) & set(expected[i])) / k for i in range(b)])
    assert recall >= 0.6, recall  # nprobe 8/32 cells
    # full probing ~= exhaustive (bf16 slab storage rounds near-tie scores)
    index_full = index.replace(nprobe=32)
    out2 = ivf_search(index_full, SearchQueries(vector=jnp.asarray(q)), top_k=k)
    got2 = np.asarray(out2.indices)
    recall_full = np.mean([len(set(got2[i]) & set(expected[i])) / k for i in range(b)])
    assert recall_full >= 0.9, recall_full


@pytest.mark.slow
def test_opq_improves_pq_recall() -> None:
    """OPQ rotation should not hurt (and usually helps) PQ recall on
    correlated data (random gaussian is rotation-invariant, so build a
    correlated corpus)."""
    rng = np.random.default_rng(9)
    n, d, b, k = 2000, 32, 8, 10
    # correlated: low-rank structure + noise -> unbalanced subspace energies
    basis = rng.normal(size=(8, d)).astype("float32")
    corpus = (rng.normal(size=(n, 8)).astype("float32") @ basis
              + 0.1 * rng.normal(size=(n, d)).astype("float32"))
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    q = corpus[rng.choice(n, b)] + 0.05 * rng.normal(size=(b, d)).astype("float32")
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]

    def recall(use_opq: bool) -> float:
        index = build_pq_index(
            jax.random.PRNGKey(0), jnp.asarray(corpus), n_subquantizers=8,
            coarse_dim=16, n_candidates=256, kmeans_iters=4, use_opq=use_opq,
        )
        out = pq_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k)
        got = np.asarray(out.indices)
        return float(np.mean([len(set(got[i]) & set(expected[i])) / k for i in range(b)]))

    r_plain, r_opq = recall(False), recall(True)
    assert r_opq >= r_plain - 0.05, (r_plain, r_opq)
    assert r_opq >= 0.5, r_opq


def test_factory_build_and_cache(tmp_path) -> None:
    from vod_tpu.configs.search import HybridSearchFactoryConfig, DenseFactoryConfig, SparseFactoryConfig
    from vod_tpu.search.factory import build_hybrid_engines
    from vod_tpu.search.dense import PQIndex, pq_search

    rng = np.random.default_rng(11)
    corpus = _corpus(rng, 600, 32)
    cfg = HybridSearchFactoryConfig(
        dense=DenseFactoryConfig(codec="pq", n_subquantizers=8, coarse_dim=16, n_candidates=128, kmeans_iters=2),
        sparse=SparseFactoryConfig(max_postings=16),
    )
    docs = [[int(t) for t in rng.integers(0, 64, 5)] for _ in range(600)]
    engines = build_hybrid_engines(
        cfg, vectors=jnp.asarray(corpus), doc_terms=docs,
        cache_dir=str(tmp_path), data_fingerprint="fp1",
    )
    assert isinstance(engines.dense, PQIndex)
    assert engines.sparse is not None
    # second build loads from cache and searches identically
    engines2 = build_hybrid_engines(
        cfg, vectors=jnp.asarray(corpus), doc_terms=docs,
        cache_dir=str(tmp_path), data_fingerprint="fp1",
    )
    q = SearchQueries(vector=jnp.asarray(_corpus(rng, 4, 32)))
    out1 = pq_search(engines.dense, q, top_k=5)
    out2 = pq_search(engines2.dense, q, top_k=5)
    assert np.array_equal(np.asarray(out1.indices), np.asarray(out2.indices))


@pytest.mark.slow
def test_pq_from_host_matches_device_build() -> None:
    from vod_tpu.search import build_pq_index_from_host
    rng = np.random.default_rng(12)
    corpus = _corpus(rng, 1200, 32)
    q = _corpus(rng, 4, 32)
    idx = build_pq_index_from_host(
        jax.random.PRNGKey(0), corpus, n_subquantizers=8, coarse_dim=16,
        n_candidates=256, train_size=1200, kmeans_iters=3, slab=500,
    )
    out = pq_search(idx, SearchQueries(vector=jnp.asarray(q)), top_k=10)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :10]
    got = np.asarray(out.indices)
    recall = np.mean([len(set(got[i]) & set(expected[i])) / 10 for i in range(4)])
    assert recall >= 0.4, recall  # PQ8 on random data; just checks the slab path works
    assert np.all(got < 1200)


def test_exact_topk_reachable_from_config() -> None:
    """approx_recall=None (faiss-Flat exactness parity) flows from the factory
    config through the index into the scan."""
    from vod_tpu.configs.search import DenseFactoryConfig
    from vod_tpu.search.factory import build_dense_from_config

    rng = np.random.default_rng(11)
    n, d, b, k = 1500, 32, 4, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    cfg = DenseFactoryConfig(codec="flat", dtype="float32", approx_recall=None)
    index = build_dense_from_config(cfg, jnp.asarray(corpus))
    assert index.approx_recall is None
    out = dense_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    for i in range(b):
        assert set(got[i].tolist()) == set(expected[i].tolist())


@pytest.mark.slow
def test_sharded_int8_matches_unsharded() -> None:
    """The sharded engine's int8-MXU path returns the same ids as the
    single-device int8 engine (exact per-shard selection)."""
    from vod_tpu.parallel import make_mesh

    mesh = make_mesh((8,), ("shard",))
    rng = np.random.default_rng(12)
    n, d, b, k = 3000, 32, 4, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    flat = build_dense_index(jnp.asarray(corpus), dtype="int8", approx_recall=None)
    ref = dense_search(flat, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
    sharded = build_sharded_dense_index(
        jnp.asarray(corpus), mesh, dtype="int8", approx_recall=None
    )
    out = sharded_dense_search(sharded, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=128)
    ref_i, got_i = np.asarray(ref.indices), np.asarray(out.indices)
    for i in range(b):
        # identical quantization + exact selection -> identical id sets
        assert set(got_i[i].tolist()) == set(ref_i[i].tolist())
    assert np.allclose(np.asarray(out.scores), np.asarray(ref.scores), atol=1e-4)


@pytest.mark.slow
def test_sharded_pq_matches_unsharded() -> None:
    """ShardedPQIndex (codes row-sharded, codebooks replicated) returns the same
    ids as the unsharded PQ engine when candidates cover all rows."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import shard_pq_index, sharded_pq_search

    mesh = make_mesh((8,), ("shard",))
    rng = np.random.default_rng(13)
    n, d, b, k = 3000, 32, 4, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    pq = build_pq_index(
        jax.random.PRNGKey(0), jnp.asarray(corpus),
        n_subquantizers=8, coarse_dim=16, n_candidates=n, kmeans_iters=4,
        approx_recall=None,
    )
    ref = pq_search(pq, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
    spq = shard_pq_index(pq, mesh)
    out = sharded_pq_search(spq, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=128)
    ref_i, got_i = np.asarray(ref.indices), np.asarray(out.indices)
    for i in range(b):
        # exhaustive candidates + exact selection -> identical ADC top-k id sets
        assert set(got_i[i].tolist()) == set(ref_i[i].tolist()), i
    assert np.allclose(np.asarray(out.scores), np.asarray(ref.scores), atol=1e-4)


@pytest.mark.slow
def test_sharded_pq_subset_filtering() -> None:
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import shard_pq_index, sharded_pq_search

    mesh = make_mesh((8,), ("shard",))
    rng = np.random.default_rng(14)
    n, d, b, k = 2000, 32, 2, 16
    corpus = _corpus(rng, n, d)
    subsets = rng.integers(0, 4, size=n).astype("int32")
    q = _corpus(rng, b, d)
    pq = build_pq_index(
        jax.random.PRNGKey(1), jnp.asarray(corpus),
        n_subquantizers=8, coarse_dim=16, n_candidates=512, kmeans_iters=3,
        subset_ids=jnp.asarray(subsets),
    )
    spq = shard_pq_index(pq, mesh)
    allowed = jnp.asarray([[1, -1], [-1, -1]], dtype="int32")
    out = sharded_pq_search(
        spq, SearchQueries(vector=jnp.asarray(q), subset_ids=allowed), top_k=k, chunk=128
    )
    got = np.asarray(out.indices)
    for x in got[0]:
        if x >= 0:
            assert subsets[x] == 1
    assert np.all(got[1] >= 0)  # unfiltered row


@pytest.mark.slow
def test_factory_ivf_opq_sharded_reachable() -> None:
    """Every DenseFactoryConfig codec knob builds the index type it names."""
    from vod_tpu.configs.search import DenseFactoryConfig
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import ShardedDenseIndex, ShardedPQIndex
    from vod_tpu.search.dense import IVFIndex, PQIndex
    from vod_tpu.search.factory import build_dense_from_config

    rng = np.random.default_rng(15)
    corpus = jnp.asarray(_corpus(rng, 1000, 32))

    ivf = build_dense_from_config(
        DenseFactoryConfig(codec="ivf", n_clusters=8, nprobe=4, kmeans_iters=3), corpus
    )
    assert isinstance(ivf, IVFIndex) and ivf.centroids.shape[0] == 8

    opq = build_dense_from_config(
        DenseFactoryConfig(codec="pq", n_subquantizers=8, coarse_dim=8, use_opq=True,
                           kmeans_iters=2, opq_iters=2),
        corpus,
    )
    assert isinstance(opq, PQIndex) and opq.rotation is not None

    mesh = make_mesh((8,), ("shard",))
    sh = build_dense_from_config(
        DenseFactoryConfig(codec="int8", sharded=True), corpus, mesh=mesh
    )
    assert isinstance(sh, ShardedDenseIndex) and sh.scale is not None

    shpq = build_dense_from_config(
        DenseFactoryConfig(codec="pq", n_subquantizers=8, coarse_dim=8, sharded=True,
                           kmeans_iters=2),
        corpus, mesh=mesh,
    )
    assert isinstance(shpq, ShardedPQIndex)


def test_factory_faiss_string_ivf_and_opq() -> None:
    from vod_tpu.configs.search import DenseFactoryConfig

    # IVF…,PQ… now maps to the cell-pruned ivfpq codec (the reference's
    # default factory shape); PQ without IVF maps to the exhaustive codec.
    cfg = DenseFactoryConfig.from_faiss_factory("OPQ32_64,IVFauto,PQ32x8")
    assert cfg.codec == "ivfpq" and cfg.use_opq and cfg.n_subquantizers == 32
    assert cfg.n_clusters is None
    cfg1 = DenseFactoryConfig.from_faiss_factory("OPQ32_64,PQ32x8")
    assert cfg1.codec == "pq" and cfg1.use_opq and cfg1.n_subquantizers == 32
    cfg2 = DenseFactoryConfig.from_faiss_factory("IVF256,Flat")
    assert cfg2.codec == "ivf" and cfg2.n_clusters == 256
    cfg3 = DenseFactoryConfig.from_faiss_factory("IVFauto,Flat")
    assert cfg3.codec == "ivf" and cfg3.n_clusters is None
    cfg4 = DenseFactoryConfig.from_faiss_factory("IVF512,PQ64x4")
    assert cfg4.codec == "ivfpq" and cfg4.n_clusters == 512 and cfg4.code_bits == 4


def test_factory_sparse_subset_ids_passthrough() -> None:
    """`build_hybrid_engines` must not drop subset filtering for sparse."""
    from vod_tpu.configs.search import HybridSearchFactoryConfig, SparseFactoryConfig
    from vod_tpu.search.factory import build_hybrid_engines

    doc_terms = [[1, 2], [1, 3], [2, 3], [1, 2, 3]]
    subsets = np.asarray([0, 0, 1, 1], dtype=np.int32)
    engines = build_hybrid_engines(
        HybridSearchFactoryConfig(sparse=SparseFactoryConfig(max_postings=8)),
        doc_terms=doc_terms, subset_ids=jnp.asarray(subsets),
    )
    queries = SearchQueries(
        terms=jnp.asarray([[1, 2]], dtype="int32"),
        subset_ids=jnp.asarray([[1, -1]], dtype="int32"),
    )
    out = sparse_search(engines.sparse, queries, top_k=4)
    got = np.asarray(out.indices)[0]
    for x in got:
        if x >= 0:
            assert subsets[x] == 1, got


@pytest.mark.slow
def test_pq_search_chunks_large_batches(monkeypatch) -> None:
    """pq_search maps over query chunks when the ADC rescore block would be
    large; chunked and unchunked calls agree exactly (regression: a 4096-query
    call asked XLA for an 8GB rescore temp and OOMed)."""
    from vod_tpu.search import dense as dense_mod

    rng = np.random.default_rng(3)
    n, d, b = 1024, 32, 50
    v = rng.normal(size=(n, d)).astype("float32")
    v[:, :8] *= 4.0  # anisotropic so PQ has signal
    q = jnp.asarray(v[rng.integers(0, n, b)] + 0.01 * rng.normal(size=(b, d)).astype("float32"))
    index = dense_mod.build_pq_index(
        jax.random.PRNGKey(0), jnp.asarray(v),
        n_subquantizers=4, coarse_dim=8, n_candidates=64, kmeans_iters=2,
    )
    ref = dense_mod.pq_search(index, SearchQueries(vector=q), top_k=5)
    monkeypatch.setattr(dense_mod, "_PQ_RESCORE_ELEMS", 16 * 64 * 4)  # qchunk=16
    got = dense_mod.pq_search(index, SearchQueries(vector=q), top_k=5)
    assert np.array_equal(np.asarray(got.indices), np.asarray(ref.indices))
    assert np.allclose(np.asarray(got.scores), np.asarray(ref.scores), atol=1e-5)


@pytest.mark.slow
def test_sharded_ivf_matches_unsharded() -> None:
    """IVF cells sharded over the 8-device mesh: replicated probe + owner-only
    scoring + all_gather merge returns exactly the unsharded ivf_search result
    (same probes, same cells, same scores)."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search.dense import build_ivf_index, ivf_search
    from vod_tpu.search.sharded import shard_ivf_index, sharded_ivf_search

    rng = np.random.default_rng(17)
    n, d, b, k = 600, 24, 7, 5
    v = rng.normal(size=(n, d)).astype("float32")
    q = jnp.asarray(v[rng.integers(0, n, b)] + 0.02 * rng.normal(size=(b, d)).astype("float32"))
    index = build_ivf_index(
        jax.random.PRNGKey(0), jnp.asarray(v), n_clusters=12, nprobe=4, kmeans_iters=3,
    )
    ref = ivf_search(index, SearchQueries(vector=q), top_k=k)

    mesh = make_mesh((8,), ("shard",))
    sharded = shard_ivf_index(index, mesh)
    got = sharded_ivf_search(sharded, SearchQueries(vector=q), top_k=k)
    assert np.array_equal(np.asarray(got.indices), np.asarray(ref.indices))
    assert np.allclose(np.asarray(got.scores), np.asarray(ref.scores), atol=1e-4)

    # reachable from the factory config
    from vod_tpu.configs.search import DenseFactoryConfig
    from vod_tpu.search.factory import build_dense_from_config
    from vod_tpu.search.sharded import ShardedIVFIndex

    cfg = DenseFactoryConfig(codec="ivf", n_clusters=12, nprobe=4, kmeans_iters=3, sharded=True)
    out = build_dense_from_config(cfg, jnp.asarray(v), mesh=mesh)
    assert isinstance(out, ShardedIVFIndex)


@pytest.mark.slow
def test_pq_exhaustive_adc_exact_order() -> None:
    """coarse_dim=None = exhaustive ADC: q.decode(codes) for every row, so with
    exact selection the result must equal the brute-force decoded ranking."""
    from vod_tpu.search.dense import decode_rows

    rng = np.random.default_rng(21)
    n, d, b, k = 2000, 64, 4, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_pq_index(
        jax.random.PRNGKey(2), jnp.asarray(corpus),
        n_subquantizers=16, coarse_dim=None, kmeans_iters=4, approx_recall=None,
    )
    assert index.coarse_codes is None and index.proj is None
    out = pq_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
    decoded = np.asarray(decode_rows(index.codebooks, index.codes[:n]))
    expected = np.argsort(-(q.astype(np.float32) @ decoded.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    for i in range(b):
        assert set(got[i].tolist()) == set(expected[i].tolist()), i


@pytest.mark.slow
def test_pq_refine_recovers_exact_recall() -> None:
    """Exact re-rank (faiss RFlat parity) lifts PQ recall to ~flat: the ADC
    stage only needs the true top-k inside its k_factor*k pool."""
    rng = np.random.default_rng(22)
    n, d, b, k = 4000, 64, 8, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)

    def run(refine: str, k_factor: int = 8) -> float:
        index = build_pq_index(
            jax.random.PRNGKey(3), jnp.asarray(corpus),
            n_subquantizers=16, coarse_dim=None, kmeans_iters=4,
            refine=refine, k_factor=k_factor, approx_recall=None,
        )
        out = pq_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
        expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
        got = np.asarray(out.indices)
        return float(np.mean([len(set(got[i]) & set(expected[i])) / k for i in range(b)]))

    r_none, r_f32, r_int8 = run("none"), run("float32"), run("int8")
    assert r_f32 >= r_none, (r_none, r_f32)
    assert r_f32 >= 0.85, r_f32
    assert r_int8 >= r_none - 0.05, (r_none, r_int8)


@pytest.mark.slow
def test_sharded_pq_refine_matches_unsharded() -> None:
    """Exhaustive-ADC + f32 refine, sharded vs unsharded, against exact truth.

    The sharded engine refines k_factor*k candidates PER SHARD (a strictly
    larger global pool than the unsharded k_factor*k), so its recall is >= the
    unsharded engine's — sets need not be identical; both must be near-exact.
    """
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import shard_pq_index, sharded_pq_search

    mesh = make_mesh((8,), ("shard",))
    rng = np.random.default_rng(23)
    n, d, b, k = 3000, 32, 4, 8
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    pq = build_pq_index(
        jax.random.PRNGKey(4), jnp.asarray(corpus),
        n_subquantizers=8, coarse_dim=None, kmeans_iters=4,
        refine="float32", k_factor=4, approx_recall=None,
    )
    ref = pq_search(pq, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
    spq = shard_pq_index(pq, mesh)
    assert spq.coarse_codes is None and spq.refine_codes is not None
    out = sharded_pq_search(spq, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=128)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]

    def recall(ind: np.ndarray) -> float:
        return float(np.mean([len(set(ind[i]) & set(expected[i])) / k for i in range(b)]))

    r_ref, r_shard = recall(np.asarray(ref.indices)), recall(np.asarray(out.indices))
    assert r_shard >= r_ref - 1e-6, (r_ref, r_shard)
    assert r_shard >= 0.85, r_shard
    # refined scores are exact inner products: verify against the raw corpus
    got_i, got_s = np.asarray(out.indices), np.asarray(out.scores)
    for i in range(b):
        for j, idx in enumerate(got_i[i]):
            if idx >= 0:
                assert abs(got_s[i, j] - float(q[i] @ corpus[idx])) < 1e-3


def test_faiss_factory_refine_suffixes() -> None:
    from vod_tpu.configs.search import DenseFactoryConfig

    cfg = DenseFactoryConfig.from_faiss_factory("OPQ32_128,IVFauto,PQ32x8,RFlat")
    assert cfg.codec == "ivfpq" and cfg.refine == "float32" and cfg.use_opq
    cfg = DenseFactoryConfig.from_faiss_factory("IVFauto,PQ16x8,Refine(SQ8)")
    assert cfg.codec == "ivfpq" and cfg.refine == "int8" and cfg.n_subquantizers == 16
    cfg = DenseFactoryConfig.from_faiss_factory("IVFauto,PQ32x8")
    assert cfg.refine == "none"
    cfg = DenseFactoryConfig.from_faiss_factory("PQ16x8,Refine(SQ8)")
    assert cfg.codec == "pq" and cfg.refine == "int8"


def test_native_sparse_build_matches_python() -> None:
    """`build_sparse_index_native` (C++ or fallback postings builder) produces
    the same postings/impacts as the pure-Python `build_sparse_index`."""
    from vod_tpu.search import build_sparse_index, build_sparse_index_native

    rng = np.random.default_rng(31)
    n_docs, n_terms = 60, 50
    doc_terms = [
        rng.integers(0, n_terms, size=rng.integers(3, 20)).tolist() for _ in range(n_docs)
    ]
    a = build_sparse_index(doc_terms, n_terms=n_terms, max_postings=16)
    b = build_sparse_index_native(doc_terms, n_terms=n_terms, max_postings=16)
    da, db = np.asarray(a.postings_docs), np.asarray(b.postings_docs)
    ia, ib = np.asarray(a.postings_impacts), np.asarray(b.postings_impacts)
    assert da.shape == db.shape, (da.shape, db.shape)
    for t in range(n_terms):
        ma, mb = da[t] >= 0, db[t] >= 0
        # identical retained-impact multisets (ties at the truncation cut may
        # retain different DOCS of equal impact — C++/python sort-order detail)
        assert np.allclose(np.sort(ia[t][ma]), np.sort(ib[t][mb]), atol=1e-5), t
        # docs strictly above the cut impact must match exactly
        if ma.any():
            cut = ia[t][ma].min()
            sa = sorted(da[t][ma & (ia[t] > cut + 1e-6)].tolist())
            sb = sorted(db[t][mb & (ib[t] > cut + 1e-6)].tolist())
            assert sa == sb, t


@pytest.mark.slow
def test_sharded_sparse_matches_unsharded() -> None:
    """Doc-sharded BM25 over the mesh == the unsharded engine exactly (the
    shard split preserves global idf/truncation; VERDICT r2 #3)."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import (
        build_sparse_index_native,
        shard_sparse_index,
        sharded_sparse_search,
        sparse_search,
    )

    mesh = make_mesh((8,), ("shard",))
    rng = np.random.default_rng(32)
    n_docs, n_terms, b, k = 300, 80, 6, 12
    doc_terms = [
        rng.integers(0, n_terms, size=rng.integers(4, 24)).tolist() for _ in range(n_docs)
    ]
    subsets = rng.integers(0, 3, size=n_docs).astype("int32")
    index = build_sparse_index_native(
        doc_terms, n_terms=n_terms, max_postings=64, subset_ids=subsets
    )
    terms = jnp.asarray(rng.integers(0, n_terms, size=(b, 5)).astype("int32"))
    ref = sparse_search(index, SearchQueries(terms=terms), top_k=k)
    sidx = shard_sparse_index(index, mesh)
    out = sharded_sparse_search(sidx, SearchQueries(terms=terms), top_k=k)
    ref_i, got_i = np.asarray(ref.indices), np.asarray(out.indices)
    ref_s, got_s = np.asarray(ref.scores), np.asarray(out.scores)
    for i in range(b):
        assert set(got_i[i].tolist()) == set(ref_i[i].tolist()), i
    assert np.allclose(np.sort(got_s, axis=-1), np.sort(ref_s, axis=-1), atol=1e-5)

    # subset filtering parity through the sharded path
    allowed = jnp.asarray([[0, -1]] * b, dtype="int32")
    ref_f = sparse_search(index, SearchQueries(terms=terms, subset_ids=allowed), top_k=k)
    out_f = sharded_sparse_search(sidx, SearchQueries(terms=terms, subset_ids=allowed), top_k=k)
    for i in range(b):
        assert set(np.asarray(out_f.indices)[i].tolist()) == set(np.asarray(ref_f.indices)[i].tolist()), i
    for x in np.asarray(out_f.indices).ravel():
        if x >= 0:
            assert subsets[x] == 0


def test_sparse_factory_routes_native_and_sharded() -> None:
    from vod_tpu.configs.search import SparseFactoryConfig
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import ShardedSparseIndex, SparseIndex
    from vod_tpu.search.factory import build_sparse_from_config

    rng = np.random.default_rng(33)
    doc_terms = [rng.integers(0, 40, size=8).tolist() for _ in range(50)]
    cfg = SparseFactoryConfig(max_postings=32)
    idx = build_sparse_from_config(cfg, doc_terms, n_terms=40)
    assert isinstance(idx, SparseIndex)
    mesh = make_mesh((8,), ("shard",))
    sidx = build_sparse_from_config(cfg, doc_terms, n_terms=40, mesh=mesh)
    assert isinstance(sidx, ShardedSparseIndex)


@pytest.mark.slow
def test_hybrid_with_sharded_sparse() -> None:
    """Hybrid dense ∥ SHARDED sparse matches hybrid with the unsharded sparse."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import build_sparse_index_native, shard_sparse_index

    mesh = make_mesh((8,), ("shard",))
    rng = np.random.default_rng(34)
    n, d, b, k = 400, 16, 3, 8
    corpus = _corpus(rng, n, d)
    doc_terms = [rng.integers(0, 50, size=10).tolist() for _ in range(n)]
    dense = build_dense_index(jnp.asarray(corpus), dtype="float32", approx_recall=None)
    sparse = build_sparse_index_native(doc_terms, n_terms=50, max_postings=64)
    q = SearchQueries(
        vector=jnp.asarray(_corpus(rng, b, d)),
        terms=jnp.asarray(rng.integers(0, 50, size=(b, 4)).astype("int32")),
    )
    ref, _ = hybrid_search(HybridEngines(dense=dense, sparse=sparse), q, top_k=k)
    out, _ = hybrid_search(
        HybridEngines(dense=dense, sparse=shard_sparse_index(sparse, mesh)), q, top_k=k
    )
    ref_i, got_i = np.asarray(ref.indices), np.asarray(out.indices)
    for i in range(b):
        assert set(got_i[i].tolist()) == set(ref_i[i].tolist()), i


def test_pq_refine_dim_truncated_pca() -> None:
    """refine_dim stores rerank rows in truncated-PCA space: recall close to
    full-D refine on spectrally-concentrated data at refine_dim/D the memory."""
    from vod_tpu.search import build_pq_index_from_host

    rng = np.random.default_rng(24)
    n, d, b, k = 3000, 64, 6, 10
    # decaying spectrum (real-embedding-like): top-16 dims carry ~most energy
    spec = 1.0 / (1.0 + np.arange(d) / 4.0)
    corpus = (rng.standard_normal((n, d)) * spec).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = corpus[:b] + 0.05 * rng.standard_normal((b, d)).astype(np.float32)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]

    def recall(index) -> float:
        out = pq_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
        got = np.asarray(out.indices)
        return float(np.mean([len(set(got[i].tolist()) & set(expected[i])) / k for i in range(b)]))

    kw = dict(n_subquantizers=8, coarse_dim=None, kmeans_iters=3, refine="int8",
              k_factor=8, approx_recall=None)
    full = build_pq_index(jax.random.PRNGKey(5), jnp.asarray(corpus), **kw)
    trunc = build_pq_index(jax.random.PRNGKey(5), jnp.asarray(corpus), refine_dim=16, **kw)
    assert trunc.refine_codes.shape[-1] == 16 and trunc.refine_proj is not None
    r_full, r_trunc = recall(full), recall(trunc)
    assert r_trunc >= r_full - 0.1, (r_full, r_trunc)
    assert r_trunc >= 0.65, r_trunc

    # host-slab build parity for the truncated refine
    host = build_pq_index_from_host(
        jax.random.PRNGKey(5), corpus, n_subquantizers=8, coarse_dim=None,
        kmeans_iters=3, refine="int8", refine_dim=16, k_factor=8, slab=1024,
        train_size=n, approx_recall=None,
    )
    assert host.refine_codes.shape[-1] == 16
    assert recall(host) >= 0.6

    # sharded parity
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import shard_pq_index, sharded_pq_search

    mesh = make_mesh((8,), ("shard",))
    spq = shard_pq_index(trunc, mesh)
    out = sharded_pq_search(spq, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=128)
    got = np.asarray(out.indices)
    r_shard = float(np.mean([len(set(got[i].tolist()) & set(expected[i])) / k for i in range(b)]))
    assert r_shard >= r_trunc - 0.1, (r_trunc, r_shard)


def test_decode_rows_onehot_matches_gather() -> None:
    """The one-hot MXU decode is bit-identical to the gather decode at any
    dtype (exact selection; summing the 255 zero terms is a no-op)."""
    from vod_tpu.search.dense import decode_rows

    rng = np.random.default_rng(3)
    m, ksub, dsub, c = 8, 256, 12, 300
    codebooks = jnp.asarray(rng.standard_normal((m, ksub, dsub)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, ksub, size=(c, m)).astype(np.uint8))
    for dtype in (jnp.float32, jnp.bfloat16):
        a = np.asarray(decode_rows(codebooks, codes, dtype=dtype))
        b = np.asarray(decode_rows(codebooks, codes, dtype=dtype, onehot=True))
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)


def test_pq_subset_filter_concentrated_candidates() -> None:
    """Subset filtering can put every finite score in ONE chunk of a dataset-
    contiguous corpus; proportional candidate collection must not truncate
    (lossless per-chunk share when filtering is active)."""
    rng = np.random.default_rng(11)
    n, d, k = 4096, 64, 48
    corpus = _corpus(rng, n, d)
    # dataset-contiguous subsets: rows 0..255 are subset 7, the rest subset 0
    subset_ids = np.zeros(n, np.int32)
    subset_ids[:256] = 7
    index = build_pq_index(
        jax.random.PRNGKey(0), jnp.asarray(corpus),
        n_subquantizers=16, coarse_dim=None, kmeans_iters=3,
        refine="float32", k_factor=4, subset_ids=jnp.asarray(subset_ids),
    )
    q = jnp.asarray(_corpus(rng, 2, d))
    out = pq_search(
        index,
        SearchQueries(vector=q, subset_ids=jnp.full((2, 1), 7, jnp.int32)),
        top_k=k,
        chunk=256,  # 16 chunks; all subset-7 rows live in chunk 0
    )
    got = np.asarray(out.indices)
    # every returned hit is from subset 7, and the full subset is recoverable:
    # 48 of the 256 subset rows must come back (not capped by a 32-floor)
    for row in got:
        valid = row[row >= 0]
        assert len(valid) == k, "truncated candidate collection under filtering"
        assert np.all(valid < 256)


def test_pq4_pack_roundtrip() -> None:
    """Nibble packing is lossless for code values < 16 (any leading shape)."""
    from vod_tpu.search.dense import _pack_codes4, _unpack_codes4

    rng = np.random.default_rng(7)
    codes = jnp.asarray(rng.integers(0, 16, size=(37, 12)).astype("uint8"))
    packed = _pack_codes4(codes)
    assert packed.shape == (37, 6) and packed.dtype == jnp.uint8
    assert np.array_equal(np.asarray(_unpack_codes4(packed)), np.asarray(codes))
    codes3 = jnp.asarray(rng.integers(0, 16, size=(4, 9, 8)).astype("uint8"))
    assert np.array_equal(
        np.asarray(_unpack_codes4(_pack_codes4(codes3))), np.asarray(codes3)
    )


def test_pq4_exhaustive_refine_recall() -> None:
    """4-bit fast-scan codec (faiss `PQ{M}x4fs` parity): nibble-packed codes at
    M/2 B/vec, 16-entry codebooks; with int8 refine the recall approaches the
    8-bit codec's."""
    rng = np.random.default_rng(31)
    n, d, b, k = 4000, 64, 8, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_pq_index(
        jax.random.PRNGKey(5), jnp.asarray(corpus),
        n_subquantizers=32, code_bits=4, coarse_dim=None, kmeans_iters=4,
        refine="int8", k_factor=8, approx_recall=None,
    )
    assert index.code_bits == 4
    assert index.codes.shape[-1] == 16  # 32 subquantizers nibble-packed
    assert index.codebooks.shape[1] == 16
    out = pq_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    recall = float(np.mean([len(set(got[i]) & set(expected[i])) / k for i in range(b)]))
    assert recall >= 0.8, recall


def test_pq4_coarse_path_unpacks_candidates() -> None:
    """The coarse-scan + ADC-rescore path unpacks gathered 4-bit codes."""
    rng = np.random.default_rng(33)
    n, d, b, k = 2000, 32, 4, 5
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_pq_index(
        jax.random.PRNGKey(6), jnp.asarray(corpus),
        n_subquantizers=8, code_bits=4, coarse_dim=16, n_candidates=256,
        kmeans_iters=4, approx_recall=None,
    )
    out = pq_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
    got = np.asarray(out.indices)
    assert got.shape == (b, k) and (got >= 0).all()
    # ADC order must match the unpacked-codes ADC reference
    from vod_tpu.ops import pq as pq_ops
    from vod_tpu.search.dense import _unpack_codes4

    lut = pq_ops.adc_lut(index.codebooks, jnp.asarray(q))
    all_codes = _unpack_codes4(index.codes)[None, :n].repeat(b, axis=0)
    adc_ref = np.asarray(pq_ops.adc_score_codes(lut, all_codes))
    for i in range(b):
        ref_top = set(np.argsort(-adc_ref[i])[: 3 * k].tolist())
        assert len(set(got[i].tolist()) & ref_top) >= k - 1


def test_faiss_factory_pq4_fastscan() -> None:
    """`PQ{M}x4fs[r]` factory strings select the 4-bit codec."""
    from vod_tpu.configs.search import DenseFactoryConfig

    cfg = DenseFactoryConfig.from_faiss_factory("OPQ64_128,PQ128x4fs")
    assert cfg.codec == "pq" and cfg.code_bits == 4
    assert cfg.n_subquantizers == 128 and cfg.use_opq
    cfg = DenseFactoryConfig.from_faiss_factory("PQ64x4fs,RFlat")
    assert cfg.code_bits == 4 and cfg.refine == "float32"
    cfg = DenseFactoryConfig.from_faiss_factory("OPQ32_512,IVFauto,PQ32x8")
    assert cfg.code_bits == 8 and cfg.n_subquantizers == 32


@pytest.mark.slow
def test_sharded_pq4_matches_unsharded() -> None:
    """4-bit exhaustive ADC + int8 refine: sharded recall >= unsharded."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import shard_pq_index, sharded_pq_search

    mesh = make_mesh((8,), ("shard",))
    rng = np.random.default_rng(35)
    n, d, b, k = 3000, 32, 4, 8
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    pq = build_pq_index(
        jax.random.PRNGKey(8), jnp.asarray(corpus),
        n_subquantizers=8, code_bits=4, coarse_dim=None, kmeans_iters=4,
        refine="int8", k_factor=4, approx_recall=None,
    )
    ref = pq_search(pq, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
    spq = shard_pq_index(pq, mesh)
    assert spq.code_bits == 4
    out = sharded_pq_search(spq, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=128)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]

    def recall(ind: np.ndarray) -> float:
        return float(np.mean([len(set(ind[i]) & set(expected[i])) / k for i in range(b)]))

    r_ref, r_shard = recall(np.asarray(ref.indices)), recall(np.asarray(out.indices))
    assert r_shard >= r_ref - 0.13, (r_ref, r_shard)
    assert r_shard >= 0.7, r_shard


def test_pq_direct_serving_codec_matches_bruteforce() -> None:
    """coarse→refine direct (keep_codes=False): the serving codec — coarse int8
    scan feeds the exact re-rank with no PQ/ADC stage. With a full-width coarse
    projection, wide pool and exact refine, the result equals brute force."""
    rng = np.random.default_rng(21)
    n, d, b, k = 3000, 32, 8, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_pq_index(
        jax.random.PRNGKey(0), jnp.asarray(corpus),
        coarse_dim=d, refine="float32", k_factor=16,
        approx_recall=None, keep_codes=False,
    )
    assert index.codes is None and index.coarse_codes is not None
    out = pq_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    for i in range(b):
        assert set(got[i].tolist()) == set(expected[i].tolist()), i
    # truncated coarse + int8 refine: decent recall at 2x less scan bytes —
    # i.i.d. gaussian data is the documented worst case for any PCA filter
    # (real embeddings concentrate variance; see build_pq_index CAUTION)
    idx2 = build_pq_index(
        jax.random.PRNGKey(0), jnp.asarray(corpus),
        coarse_dim=16, refine="int8", k_factor=32,
        approx_recall=None, keep_codes=False,
    )
    got2 = np.asarray(pq_search(idx2, SearchQueries(vector=jnp.asarray(q)), top_k=k).indices)
    rec = np.mean([len(set(got2[i]) & set(expected[i])) / k for i in range(b)])
    assert rec >= 0.7, rec


def test_pq_direct_serving_codec_fused_kernel() -> None:
    """kernel='fused' routes the direct codec's coarse stage through the Pallas
    matmul+binned-top-k kernel (the B=64 serving win: no per-chunk score
    traffic). Bin collisions may drop pool candidates; the refine re-rank
    restores exact ordering of what the bins kept, so top-k recall stays high
    and returned scores are the exact f32 dots of the returned ids."""
    rng = np.random.default_rng(24)
    n, d, b, k = 3000, 32, 8, 10  # pads to 3072 rows = 3 x 1024 fused tiles
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_pq_index(
        jax.random.PRNGKey(0), jnp.asarray(corpus),
        coarse_dim=d, refine="float32", k_factor=16,
        keep_codes=False, kernel="fused",
    )
    assert index.codes is None and index.kernel == "fused"
    out = pq_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    recall = np.mean([len(set(got[i]) & set(expected[i])) / k for i in range(b)])
    assert recall >= 0.9, recall
    scores = q @ corpus.T
    got_s = np.asarray(out.scores)
    for i in range(b):
        valid = got[i] >= 0
        np.testing.assert_allclose(
            got_s[i][valid], scores[i, got[i][valid]], rtol=1e-5, atol=1e-6
        )
    # subset filtering falls back to the scan path (fused kernel can't mask):
    # results must still respect the filter
    sub = np.arange(n, dtype=np.int32) % 7
    idx_f = build_pq_index(
        jax.random.PRNGKey(0), jnp.asarray(corpus),
        coarse_dim=d, refine="float32", k_factor=16,
        keep_codes=False, kernel="fused", subset_ids=jnp.asarray(sub),
    )
    allowed = jnp.full((b, 1), 3, jnp.int32)
    out_f = pq_search(idx_f, SearchQueries(vector=jnp.asarray(q), subset_ids=allowed), top_k=k)
    got_f = np.asarray(out_f.indices)
    assert np.all((got_f < 0) | (got_f % 7 == 3))


def test_pq_direct_build_validations() -> None:
    rng = np.random.default_rng(22)
    corpus = jnp.asarray(_corpus(rng, 600, 16))
    with pytest.raises(ValueError, match="keep_codes=False requires"):
        build_pq_index(jax.random.PRNGKey(0), corpus, coarse_dim=None, keep_codes=False)
    with pytest.raises(ValueError, match="keep_codes=False requires"):
        build_pq_index(
            jax.random.PRNGKey(0), corpus, coarse_dim=8, refine="none", keep_codes=False
        )


def test_sharded_pq_direct_matches_unsharded() -> None:
    """The serving codec sharded over the mesh: same ids as unsharded."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import shard_pq_index, sharded_pq_search

    mesh = make_mesh((8,), ("shard",))
    rng = np.random.default_rng(23)
    n, d, b, k = 3000, 32, 4, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    # full-width coarse: the int8 coarse order's top k_factor*k certainly
    # contains the exact top-k, so sharded (per-shard pools are supersets)
    # and unsharded agree exactly after the identical int8 refine
    pq = build_pq_index(
        jax.random.PRNGKey(0), jnp.asarray(corpus),
        coarse_dim=d, refine="int8", k_factor=16,
        approx_recall=None, keep_codes=False,
    )
    ref = pq_search(pq, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=256)
    spq = shard_pq_index(pq, mesh)
    assert spq.codes is None
    out = sharded_pq_search(spq, SearchQueries(vector=jnp.asarray(q)), top_k=k, chunk=128)
    ref_i, got_i = np.asarray(ref.indices), np.asarray(out.indices)
    for i in range(b):
        assert set(got_i[i].tolist()) == set(ref_i[i].tolist()), i
    assert np.allclose(np.asarray(out.scores), np.asarray(ref.scores), atol=1e-4)


def test_pq_direct_from_host_and_config() -> None:
    """Host-slab build + config routing (codec: pq, keep_codes: false)."""
    from vod_tpu.configs.search import DenseFactoryConfig
    from vod_tpu.search import build_pq_index_from_host
    from vod_tpu.search.factory import build_dense_from_config

    rng = np.random.default_rng(24)
    corpus = _corpus(rng, 1200, 32)
    q = _corpus(rng, 4, 32)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :10]

    idx = build_pq_index_from_host(
        jax.random.PRNGKey(0), corpus, coarse_dim=16, refine="int8", k_factor=16,
        train_size=1200, slab=500, approx_recall=None, keep_codes=False,
    )
    assert idx.codes is None
    got = np.asarray(pq_search(idx, SearchQueries(vector=jnp.asarray(q)), top_k=10).indices)
    rec = np.mean([len(set(got[i]) & set(expected[i])) / 10 for i in range(4)])
    assert rec >= 0.8, rec

    cfg = DenseFactoryConfig(
        codec="pq", coarse_dim=16, refine="int8", k_factor=16,
        keep_codes=False, approx_recall=None,
    )
    idx_c = build_dense_from_config(cfg, jnp.asarray(corpus), rng=jax.random.PRNGKey(0))
    assert idx_c.codes is None and idx_c.refine_codes is not None

    # kernel knob reaches the PQ coarse stage from config (both build paths)
    cfg_f = DenseFactoryConfig(
        codec="pq", coarse_dim=16, refine="int8", k_factor=16,
        keep_codes=False, kernel="fused",
    )
    idx_k = build_dense_from_config(cfg_f, jnp.asarray(corpus), rng=jax.random.PRNGKey(0))
    assert idx_k.kernel == "fused"
    idx_hk = build_pq_index_from_host(
        jax.random.PRNGKey(0), corpus, coarse_dim=16, refine="int8", k_factor=16,
        train_size=1200, slab=500, keep_codes=False, kernel="fused",
    )
    assert idx_hk.kernel == "fused"


# --------------------------------------------------------------------------- #
# flat exact-f32 refine (faiss `Flat,RFlat` analogue on a bf16/int8 store)
# --------------------------------------------------------------------------- #


def test_flat_refine_exact_order() -> None:
    """bf16 store + f32 refine rows reproduces the exact f32 brute-force
    ordering (bf16 score rounding alone reorders near-ties)."""
    rng = np.random.default_rng(31)
    n, d, b, k = 2000, 64, 8, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_dense_index(jnp.asarray(corpus), dtype="bfloat16", refine="float32")
    assert index.refine_rows is not None and index.refine_rows.dtype == jnp.float32
    out = dense_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k)
    expected_i = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    expected_s = np.sort((q @ corpus.T), axis=-1)[:, ::-1][:, :k]
    got = np.asarray(out.indices)
    for i in range(b):
        assert set(got[i].tolist()) == set(expected_i[i].tolist()), i
    np.testing.assert_allclose(np.asarray(out.scores), expected_s, rtol=1e-5, atol=1e-6)


def test_flat_refine_int8_exact_recall() -> None:
    """int8 store + f32 refine: the k_factor*k int8 candidate pool contains the
    true top-k at this size, so the refined result is exact."""
    rng = np.random.default_rng(32)
    n, d, b, k = 2000, 64, 8, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_dense_index(jnp.asarray(corpus), dtype="int8", refine="float32", k_factor=8)
    out = dense_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    recall = np.mean([len(set(got[i]) & set(expected[i])) / k for i in range(b)])
    assert recall == 1.0, recall


def test_flat_refine_respects_subset_filter() -> None:
    """Refine rescoring must not resurrect candidates the subset filter
    excluded (-inf first-stage scores stay -inf)."""
    rng = np.random.default_rng(33)
    n, d, b, k = 1000, 32, 4, 5
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    subset = (np.arange(n) % 3).astype("int32")  # three interleaved datasets
    index = build_dense_index(
        jnp.asarray(corpus), dtype="bfloat16", refine="float32",
        subset_ids=jnp.asarray(subset),
    )
    allowed = jnp.asarray([[0], [1], [2], [0]], jnp.int32)
    out = dense_search(
        index, SearchQueries(vector=jnp.asarray(q), subset_ids=allowed), top_k=k
    )
    got = np.asarray(out.indices)
    scores = q @ corpus.T
    for i in range(b):
        ok_rows = np.where(subset == int(allowed[i, 0]))[0]
        expected = ok_rows[np.argsort(-scores[i, ok_rows])][:k]
        assert set(got[i].tolist()) == set(expected.tolist()), i


def test_flat_refine_fused_kernel() -> None:
    """The fused binned kernel selects the k_factor*k pool; refine restores
    exact ordering of whatever the kernel's bins kept."""
    rng = np.random.default_rng(34)
    n, d, b, k = 2000, 64, 8, 10
    corpus = _corpus(rng, n, d)
    q = _corpus(rng, b, d)
    index = build_dense_index(
        jnp.asarray(corpus), dtype="bfloat16", kernel="fused", refine="float32"
    )
    out = dense_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=k)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :k]
    got = np.asarray(out.indices)
    recall = np.mean([len(set(got[i]) & set(expected[i])) / k for i in range(b)])
    assert recall >= 0.9, recall
    # returned scores are the exact f32 dot of the returned ids
    scores = q @ corpus.T
    got_s = np.asarray(out.scores)
    for i in range(b):
        np.testing.assert_allclose(got_s[i], scores[i, got[i]], rtol=1e-5, atol=1e-6)


def test_factory_flat_refine_reachable() -> None:
    from vod_tpu.configs.search import DenseFactoryConfig
    from vod_tpu.search.factory import build_dense_from_config

    rng = np.random.default_rng(35)
    corpus = _corpus(rng, 800, 32)
    cfg = DenseFactoryConfig(codec="flat", dtype="bfloat16", refine="float32")
    index = build_dense_from_config(cfg, jnp.asarray(corpus))
    assert index.refine_rows is not None
    q = _corpus(rng, 4, 32)
    out = dense_search(index, SearchQueries(vector=jnp.asarray(q)), top_k=5)
    expected = np.argsort(-(q @ corpus.T), axis=-1)[:, :5]
    assert np.array_equal(np.asarray(out.indices), expected)
