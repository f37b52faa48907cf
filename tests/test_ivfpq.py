"""IVF-PQ: cell-pruned PQ search (faiss `OPQ,IVF,PQ[,Refine]` parity).

Covers: lossless probing (nprobe=C matches exhaustive PQ), pruned-probe
recall, subset filtering, window-budget truncation, the factory string
`IVF…,PQ…` translation, and the config-driven build path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vod_tpu.configs.search import DenseFactoryConfig
from vod_tpu.search import SearchQueries, build_ivfpq_index, build_pq_index, ivfpq_search
from vod_tpu.search.dense import pq_search
from vod_tpu.search.factory import build_dense_from_config
from vod_tpu.search.hybrid import _dense_dispatch


def _corpus(n=4096, d=64, seed=0):
    """Decaying-spectrum vectors (PQ's realistic regime, not its worst case)."""
    rng = np.random.default_rng(seed)
    spec = np.exp(-np.arange(d) / 12.0).astype(np.float32)
    x = rng.standard_normal((n, d), dtype=np.float32) * spec
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.asarray(x)


def _queries(x, b=16, seed=1):
    rng = np.random.default_rng(seed)
    q = np.asarray(x[:b]) + 0.05 * rng.standard_normal((b, x.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def _exact_topk(x, q, k):
    s = np.asarray(q) @ np.asarray(x).T
    return np.argsort(-s, axis=-1)[:, :k]


def test_ivfpq_full_probe_is_exact_with_f32_rows():
    """nprobe=C + untruncated windows = every row probed; scoring against f32
    rerank rows is then EXACT brute force — recall vs ground truth ~ 1.0."""
    x = _corpus()
    q = _queries(x)
    k = 10
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=16, nprobe=16, window=128,
        n_subquantizers=8, kmeans_iters=4, refine="float32",
    )
    out = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), k))(ivf, q)
    a = np.asarray(out.indices)
    gt = _exact_topk(x, q, k)
    rec = np.mean([len(set(a[i]) & set(gt[i])) / k for i in range(a.shape[0])])
    assert rec >= 0.95, rec  # < 1.0 only for score ties


@pytest.mark.parametrize("code_bits", [8, 4])
def test_ivfpq_adc_path_matches_pq_candidates(code_bits):
    """Without a refine store the search falls back to one-hot ADC decode of
    the gathered codes; at full probe with shared codebooks (same rng) it must
    track exhaustive no-refine pq_search closely."""
    x = _corpus()
    q = _queries(x)
    k = 10
    rng = jax.random.PRNGKey(0)
    kwargs = dict(
        # equal code bytes: 8x8-bit = 16x4-bit = 8 B/vec on the 64-d corpus
        n_subquantizers=8 if code_bits == 8 else 16,
        code_bits=code_bits, kmeans_iters=4,
    )
    ivf = build_ivfpq_index(rng, x, n_clusters=16, nprobe=16, window=128, **kwargs)
    pq = build_pq_index(rng, x, coarse_dim=None, **kwargs)
    got_ivf = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), k))(ivf, q)
    got_pq = jax.jit(lambda ix, v: pq_search(ix, SearchQueries(vector=v), k))(pq, q)
    a, b_ = np.asarray(got_ivf.indices), np.asarray(got_pq.indices)
    overlap = np.mean([len(set(a[i]) & set(b_[i])) / k for i in range(a.shape[0])])
    # both rank by the same ADC scores (bf16 vs int8-free f32 LUT rounding
    # differs slightly near ties)
    assert overlap >= 0.8, overlap


def test_ivfpq_keep_codes_false_is_ivf_sq():
    """keep_codes=False drops PQ entirely: IVF + (PCA-)SQ rows only."""
    x = _corpus()
    q = _queries(x)
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=16, nprobe=16, window=128,
        kmeans_iters=4, refine="int8", refine_dim=32, keep_codes=False,
    )
    assert ivf.codes is None
    out = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), 10))(ivf, q)
    a = np.asarray(out.indices)
    gt = _exact_topk(x, q, 10)
    rec = np.mean([len(set(a[i]) & set(gt[i])) / 10 for i in range(a.shape[0])])
    assert rec >= 0.8, rec


def test_ivfpq_pruned_probe_recall():
    """Pruned probing (nprobe << C) keeps most of the recall on clustered data."""
    x = _corpus(n=8192)
    q = _queries(x, b=32)
    k = 10
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=64, nprobe=8, window=128,
        n_subquantizers=8, kmeans_iters=6, refine="float32",
    )
    out = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), k))(ivf, q)
    got = np.asarray(out.indices)
    gt = _exact_topk(x, q, k)
    rec = np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(got.shape[0])])
    # scanning ~1/8 of the cells
    assert rec >= 0.6, rec
    # contract: valid ids, descending scores, -inf/-1 padding alignment
    scores = np.asarray(out.scores)
    assert ((got >= -1) & (got < x.shape[0])).all()
    assert (np.diff(scores, axis=-1) <= 1e-5).all()
    assert ((got == -1) == ~np.isfinite(scores)).all()


def test_ivfpq_subset_filtering():
    x = _corpus(n=2048)
    q = _queries(x, b=8)
    n = x.shape[0]
    groups = jnp.asarray(np.arange(n) % 7, dtype=jnp.int32)
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=16, nprobe=16, window=128,
        n_subquantizers=8, kmeans_iters=4, refine="float32",
        subset_ids=groups,
    )
    allowed = jnp.asarray([[3]] * 8, dtype=jnp.int32)
    out = jax.jit(
        lambda ix, v, a: ivfpq_search(ix, SearchQueries(vector=v, subset_ids=a), 10)
    )(ivf, q, allowed)
    got = np.asarray(out.indices)
    valid = got[got >= 0]
    assert valid.size > 0
    assert (valid % 7 == 3).all()


def test_ivfpq_window_budget_truncation():
    """A tiny max_windows budget still returns valid, well-formed results."""
    x = _corpus(n=2048)
    q = _queries(x, b=8)
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=16, nprobe=8, window=128,
        max_windows=2, n_subquantizers=8, kmeans_iters=4, refine="float32",
    )
    out = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), 10))(ivf, q)
    got = np.asarray(out.indices)
    scores = np.asarray(out.scores)
    assert ((got == -1) == ~np.isfinite(scores)).all()
    # 2 windows x 128 rows >= 10 finite results per query on a full corpus
    assert (np.isfinite(scores).sum(-1) >= 10).all()


def test_device_parts_matches_host_parts():
    """The device-scatter assembly (slab-scale path) must produce the same
    layout and search results as the host assembly."""
    from vod_tpu.ops import pq as pq_ops
    from vod_tpu.ops.kmeans import _assign_chunked, kmeans
    from vod_tpu.search import build_ivfpq_from_device_parts, build_ivfpq_from_parts

    x = _corpus(n=1024)
    q = _queries(x, b=8)
    rng = jax.random.PRNGKey(0)
    codebooks = pq_ops.train_pq(rng, x, 8, n_iters=4)
    centroids, _ = kmeans(rng, x, n_clusters=8, n_iters=4)
    assign = np.asarray(_assign_chunked(x, centroids)).astype(np.int32)
    codes = pq_ops.encode_pq(codebooks, x)
    refine, scale = pq_ops.quantize_int8(x, axis=0)
    common = dict(window=128, nprobe=8, refine_scale=scale)
    host = build_ivfpq_from_parts(
        centroids, codebooks, assign, np.asarray(codes),
        refine_np=np.asarray(refine), **common,
    )
    dev = build_ivfpq_from_device_parts(
        centroids, codebooks, assign, codes, refine_dev=refine, **common,
    )
    np.testing.assert_array_equal(np.asarray(host.row_ids), np.asarray(dev.row_ids))
    np.testing.assert_array_equal(np.asarray(host.codes), np.asarray(dev.codes))
    np.testing.assert_array_equal(
        np.asarray(host.refine_codes), np.asarray(dev.refine_codes)
    )
    out_h = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), 10))(host, q)
    out_d = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), 10))(dev, q)
    np.testing.assert_array_equal(np.asarray(out_h.indices), np.asarray(out_d.indices))


def test_factory_string_ivfpq():
    cfg = DenseFactoryConfig.from_faiss_factory("OPQ32_512,IVFauto,PQ32x8")
    assert cfg.codec == "ivfpq" and cfg.use_opq and cfg.n_clusters is None
    assert cfg.n_subquantizers == 32 and cfg.code_bits == 8 and cfg.refine == "none"
    cfg = DenseFactoryConfig.from_faiss_factory("IVF4096,PQ64x4fs,Refine(SQ8)")
    assert cfg.codec == "ivfpq" and cfg.n_clusters == 4096
    assert cfg.code_bits == 4 and cfg.n_subquantizers == 64 and cfg.refine == "int8"
    # plain IVF / plain PQ still parse to their own codecs
    assert DenseFactoryConfig.from_faiss_factory("IVFauto,Flat").codec == "ivf"
    assert DenseFactoryConfig.from_faiss_factory("PQ32x8").codec == "pq"


def test_ivfpq_cache_roundtrip(tmp_path):
    """Factory cache save/load round-trip, incl. the codes=None (keep_codes
    =False) layout where the required `codes` field must restore as None."""
    x = _corpus(n=1024)
    q = _queries(x, b=8)
    cfg = DenseFactoryConfig(
        codec="ivfpq", n_clusters=8, nprobe=8, ivf_window=128,
        kmeans_iters=3, refine="int8", refine_dim=32, keep_codes=False,
    )
    built = build_dense_from_config(
        cfg, x, rng=jax.random.PRNGKey(0),
        cache_dir=str(tmp_path), data_fingerprint="fpA",
    )
    assert built.codes is None
    loaded = build_dense_from_config(
        cfg, x, rng=jax.random.PRNGKey(0),
        cache_dir=str(tmp_path), data_fingerprint="fpA",
    )
    assert loaded.codes is None and loaded.nprobe == built.nprobe
    fn = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), 10))
    np.testing.assert_array_equal(
        np.asarray(fn(built, q).indices), np.asarray(fn(loaded, q).indices)
    )


def test_ivfpq_from_config_and_dispatch():
    x = _corpus(n=2048)
    q = _queries(x, b=8)
    cfg = DenseFactoryConfig(
        codec="ivfpq", n_clusters=16, nprobe=16, ivf_window=128,
        n_subquantizers=16, code_bits=4, kmeans_iters=4,
        refine="int8", refine_dim=32,
    )
    index = build_dense_from_config(cfg, x, rng=jax.random.PRNGKey(0))
    out = jax.jit(lambda ix, v: _dense_dispatch(ix, SearchQueries(vector=v), 10))(index, q)
    got = np.asarray(out.indices)
    gt = _exact_topk(x, q, 10)
    rec = np.mean([len(set(got[i]) & set(gt[i])) / 10 for i in range(got.shape[0])])
    assert rec >= 0.7, rec


@pytest.mark.slow
def test_sharded_ivfpq_matches_unsharded():
    """Cell-sharded IVF-PQ over a virtual 4-device mesh returns the same ids
    as the unsharded engine: probing is replicated (same top-nprobe cells on
    every shard), window budgets untruncated, exact selection."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import shard_ivfpq_index, sharded_ivfpq_search

    mesh = make_mesh((4,), ("shard",))
    x = _corpus(n=4096)
    q = _queries(x, b=8)
    k = 10
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=32, nprobe=8, window=128,
        n_subquantizers=8, kmeans_iters=4, refine="float32",
        approx_recall=None,
    )
    ref = ivfpq_search(ivf, SearchQueries(vector=q), k)
    sh = shard_ivfpq_index(ivf, mesh)
    out = sharded_ivfpq_search(sh, SearchQueries(vector=q), k)
    ref_i, got_i = np.asarray(ref.indices), np.asarray(out.indices)
    for i in range(q.shape[0]):
        assert set(got_i[i].tolist()) == set(ref_i[i].tolist()), i
    assert np.allclose(np.asarray(out.scores), np.asarray(ref.scores), atol=1e-4)


@pytest.mark.slow
def test_sharded_ivfpq_subset_filtering_and_factory():
    """Subset filters survive the cell-sharded layout; the factory's
    `sharded: true` knob routes the ivfpq codec through shard_ivfpq_index."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import ShardedIVFPQIndex, sharded_ivfpq_search

    mesh = make_mesh((4,), ("shard",))
    x = _corpus(n=2048)
    q = _queries(x, b=8)
    n = x.shape[0]
    groups = jnp.asarray(np.arange(n) % 5, dtype=jnp.int32)
    cfg = DenseFactoryConfig(
        codec="ivfpq", n_clusters=16, nprobe=16, ivf_window=128,
        n_subquantizers=8, kmeans_iters=4, refine="float32", sharded=True,
    )
    sh = build_dense_from_config(
        cfg, x, rng=jax.random.PRNGKey(0), subset_ids=groups, mesh=mesh
    )
    assert isinstance(sh, ShardedIVFPQIndex)
    allowed = jnp.asarray([[2]] * 8, dtype=jnp.int32)
    out = sharded_ivfpq_search(sh, SearchQueries(vector=q, subset_ids=allowed), 10)
    got = np.asarray(out.indices)
    valid = got[got >= 0]
    assert valid.size > 0
    assert (valid % 5 == 2).all()


@pytest.mark.slow
def test_kmeans_sharded_matches_single_device():
    """Mesh-sharded Lloyd iterations (one [k,d]+[k] psum per iter) converge to
    the single-device solution: same init + same reseed keys -> near-identical
    centroids (fp reduction order differs across the shard split), and the
    quantization objective matches within 1%."""
    from vod_tpu.ops.kmeans import _assign_chunked, kmeans, kmeans_sharded
    from vod_tpu.parallel import make_mesh

    mesh = make_mesh((4,), ("shard",))
    rng_np = np.random.default_rng(7)
    k, d = 16, 32
    blobs = rng_np.standard_normal((k, d)).astype(np.float32) * 3
    x = (blobs[rng_np.integers(0, k, 4000)]
         + rng_np.standard_normal((4000, d)).astype(np.float32))
    xj = jnp.asarray(x)
    key = jax.random.PRNGKey(3)
    c1, a1 = kmeans(key, xj, n_clusters=k, n_iters=8)
    c2, a2 = kmeans_sharded(key, xj, n_clusters=k, mesh=mesh, n_iters=8)

    def qerr(c):
        a = np.asarray(_assign_chunked(xj, c))
        return float(np.mean(np.sum((x - np.asarray(c)[a]) ** 2, axis=-1)))

    e1, e2 = qerr(c1), qerr(c2)
    assert e2 <= e1 * 1.01, (e1, e2)
    # same rng path -> same init and reseeds; centroids should coincide
    # up to reduction-order noise
    assert np.allclose(np.asarray(c1), np.asarray(c2), atol=1e-3), (
        np.abs(np.asarray(c1) - np.asarray(c2)).max()
    )
    assert (np.asarray(a1) == np.asarray(a2)).mean() > 0.99


def test_ivfpq_host_slab_build_matches_device_build():
    """build_dense_from_host(codec=ivfpq) — the beyond-HBM path — produces the
    same results as the in-HBM build with the same rng (train sample ==
    corpus here, so centroids/codebooks/refine stats coincide)."""
    from vod_tpu.search.factory import build_dense_from_host

    x = _corpus(n=1536)
    q = _queries(x, b=8)
    cfg = DenseFactoryConfig(
        codec="ivfpq", n_clusters=8, nprobe=8, ivf_window=128,
        n_subquantizers=8, kmeans_iters=4, refine="int8", refine_dim=32,
        train_size=1536, approx_recall=None,
    )
    dev = build_dense_from_config(cfg, x, rng=jax.random.PRNGKey(0))
    host = build_dense_from_host(
        cfg, np.asarray(x), rng=jax.random.PRNGKey(0), slab=500
    )
    fn = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), 10))
    out_d, out_h = fn(dev, q), fn(host, q)
    np.testing.assert_array_equal(np.asarray(out_d.indices), np.asarray(out_h.indices))

    # keep_codes=False variant builds and searches sanely from host slabs
    cfg2 = cfg.model_copy(update={"keep_codes": False})
    host2 = build_dense_from_host(cfg2, np.asarray(x), rng=jax.random.PRNGKey(0), slab=700)
    assert host2.codes is None
    got = np.asarray(fn(host2, q).indices)
    gt = _exact_topk(x, q, 10)
    rec = np.mean([len(set(got[i]) & set(gt[i])) / 10 for i in range(8)])
    assert rec >= 0.8, rec


# --------------------------------------------------------------------------- #
# SOAR spilling (ScaNN, Sun et al. NeurIPS 2023 — beyond faiss)
# --------------------------------------------------------------------------- #


def test_assign_soar_picks_orthogonal_residual_cell():
    """SOAR prefers a secondary cell whose residual is ORTHOGONAL to the
    primary residual over a nearer cell whose residual is parallel to it."""
    from vod_tpu.ops.kmeans import _assign_chunked
    from vod_tpu.search.ivfpq import assign_soar

    x = jnp.asarray([[1.0, 0.0]], dtype=jnp.float32)
    cents = jnp.asarray(
        [
            [0.9, 0.0],  # primary (nearest, dist^2 = 0.01); residual r = (+0.1, 0)
            [1.5, 0.0],  # 2nd-nearest (0.25) but residual parallel to r
            [1.0, 0.6],  # farther (0.36) but residual orthogonal to r
        ],
        dtype=jnp.float32,
    )
    primary = _assign_chunked(x, cents)
    assert int(primary[0]) == 0
    # plain 2nd-nearest would pick cell 1; SOAR (lambda=1) picks cell 2:
    # loss(c1) = 0.25 + 1.0 * 0.25 = 0.50 > loss(c2) = 0.36 + 0
    second = assign_soar(x, cents, primary, soar_lambda=1.0)
    assert int(second[0]) == 2
    # lambda=0 degrades to plain 2nd-nearest
    second0 = assign_soar(x, cents, primary, soar_lambda=0.0)
    assert int(second0[0]) == 1


def test_soar_full_probe_exact_and_deduped():
    """A spilled index probing every cell returns EXACT brute-force ids with
    no duplicate row ids (the two copies of each row are deduped)."""
    x = _corpus(n=2048)
    q = _queries(x, b=16)
    k = 10
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=16, nprobe=16, window=128,
        n_subquantizers=8, kmeans_iters=4, refine="float32", spill=True,
        approx_recall=None,
    )
    assert ivf.spilled
    out = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), k))(ivf, q)
    got = np.asarray(out.indices)
    for i in range(got.shape[0]):
        valid = got[i][got[i] >= 0]
        assert len(set(valid.tolist())) == valid.size, f"dup ids in row {i}: {got[i]}"
    gt = _exact_topk(x, q, k)
    rec = np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(got.shape[0])])
    assert rec >= 0.95, rec


def test_soar_improves_pruned_probe_recall():
    """At a small nprobe the spilled copies recover boundary rows the primary
    probe misses — recall must not regress and should measurably improve."""
    x = _corpus(n=8192, seed=3)
    q = _queries(x, b=64, seed=4)
    k = 10
    common = dict(
        n_clusters=64, nprobe=4, window=128, n_subquantizers=8,
        kmeans_iters=6, refine="float32", approx_recall=None,
    )
    plain = build_ivfpq_index(jax.random.PRNGKey(0), x, **common)
    soar = build_ivfpq_index(jax.random.PRNGKey(0), x, spill=True, **common)
    fn = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), k))
    gt = _exact_topk(x, q, k)

    def recall(ix):
        got = np.asarray(fn(ix, q).indices)
        return np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(got.shape[0])])

    r_plain, r_soar = recall(plain), recall(soar)
    assert r_soar >= r_plain, (r_plain, r_soar)
    assert r_soar - r_plain >= 0.02, (r_plain, r_soar)


def test_soar_from_config_cache_and_host_slab():
    """`spill: true` routes from DenseFactoryConfig; the spilled flag survives
    the index cache; the host-slab build matches the in-HBM build."""
    import tempfile

    from vod_tpu.search.factory import build_dense_from_host

    x = _corpus(n=1536)
    q = _queries(x, b=8)
    cfg = DenseFactoryConfig(
        codec="ivfpq", n_clusters=8, nprobe=4, ivf_window=128,
        n_subquantizers=8, kmeans_iters=4, refine="int8", refine_dim=32,
        train_size=1536, approx_recall=None, spill=True,
    )
    dev = build_dense_from_config(cfg, x, rng=jax.random.PRNGKey(0))
    assert dev.spilled and dev.n_real == 1536 and dev.row_ids.shape[0] >= 2 * 1536
    fn = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), 10))
    host = build_dense_from_host(cfg, np.asarray(x), rng=jax.random.PRNGKey(0), slab=500)
    assert host.spilled
    np.testing.assert_array_equal(
        np.asarray(fn(dev, q).indices), np.asarray(fn(host, q).indices)
    )
    with tempfile.TemporaryDirectory() as tmp:
        built = build_dense_from_config(
            cfg, x, rng=jax.random.PRNGKey(0), cache_dir=tmp, data_fingerprint="fpS",
        )
        loaded = build_dense_from_config(
            cfg, x, rng=jax.random.PRNGKey(0), cache_dir=tmp, data_fingerprint="fpS",
        )
        assert loaded.spilled and loaded.n_real == built.n_real
        np.testing.assert_array_equal(
            np.asarray(fn(built, q).indices), np.asarray(fn(loaded, q).indices)
        )


@pytest.mark.slow
def test_soar_sharded_matches_unsharded():
    """Spilled copies of a row can land on DIFFERENT shards; the 2k-wide
    cross-shard merge + global dedup must return the unsharded result set."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import shard_ivfpq_index, sharded_ivfpq_search

    mesh = make_mesh((4,), ("shard",))
    x = _corpus(n=4096)
    q = _queries(x, b=8)
    k = 10
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=32, nprobe=8, window=128,
        n_subquantizers=8, kmeans_iters=4, refine="float32", spill=True,
        approx_recall=None,
    )
    ref = ivfpq_search(ivf, SearchQueries(vector=q), k)
    sh = shard_ivfpq_index(ivf, mesh)
    assert sh.spilled
    out = sharded_ivfpq_search(sh, SearchQueries(vector=q), k)
    ref_i, got_i = np.asarray(ref.indices), np.asarray(out.indices)
    for i in range(q.shape[0]):
        valid = got_i[i][got_i[i] >= 0]
        assert len(set(valid.tolist())) == valid.size, f"dup ids in row {i}"
        assert set(got_i[i].tolist()) == set(ref_i[i].tolist()), i
    assert np.allclose(np.asarray(out.scores), np.asarray(ref.scores), atol=1e-4)


# --------------------------------------------------------------------------- #
# second-stage rerank (faiss IVF + IndexRefine analogue)
# --------------------------------------------------------------------------- #


def test_ivfpq_rerank_lifts_low_fidelity_window_scoring():
    """A coarse window-scoring store (pca-int8 at refine_dim=8) caps top-k
    fidelity; the rerank stage (exact f32 rows over the pooled k_factor*k
    candidates, faiss IndexRefine parity) must recover most of it. With a
    FULL probe the pooled candidates contain the true top-k whenever the
    coarse store ranks them within the pool, so rerank recall must strictly
    beat the coarse-only recall here (fidelity is the only loss term)."""
    x = _corpus()
    q = _queries(x)
    k = 10
    kw = dict(
        n_clusters=16, nprobe=16, window=128, kmeans_iters=4,
        keep_codes=False, refine="int8", refine_dim=8, approx_recall=None,
    )
    plain = build_ivfpq_index(jax.random.PRNGKey(0), x, **kw)
    rr = build_ivfpq_index(
        jax.random.PRNGKey(0), x, rerank="float32", k_factor=8, **kw
    )
    assert rr.rerank_codes is not None and plain.rerank_codes is None
    gt = _exact_topk(x, q, k)

    def recall(ix):
        out = jax.jit(lambda i, v: ivfpq_search(i, SearchQueries(vector=v), k))(ix, q)
        a = np.asarray(out.indices)
        return np.mean([len(set(a[i].tolist()) & set(gt[i].tolist())) / k for i in range(a.shape[0])])

    r_plain, r_rr = recall(plain), recall(rr)
    assert r_rr > r_plain, (r_plain, r_rr)
    assert r_rr >= 0.9, r_rr  # exact rows over an 80-wide full-probe pool


def test_ivfpq_rerank_spilled_dedups_and_filters():
    """SOAR-spilled + rerank: the widened pool is deduped BEFORE the rerank
    gather (pool distinct rows), returned ids stay unique, and subset
    filtering applies through the rerank cut."""
    x = _corpus()
    q = _queries(x, b=8)
    n = x.shape[0]
    k = 10
    groups = jnp.asarray(np.arange(n) % 3, dtype=jnp.int32)
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=16, nprobe=8, window=128,
        kmeans_iters=4, keep_codes=False, refine="int8", refine_dim=16,
        rerank="float32", k_factor=4, spill=True, subset_ids=groups,
        approx_recall=None,
    )
    out = jax.jit(lambda i, v: ivfpq_search(i, SearchQueries(vector=v), k))(ivf, q)
    got = np.asarray(out.indices)
    for i in range(got.shape[0]):
        valid = got[i][got[i] >= 0]
        assert len(set(valid.tolist())) == valid.size, f"dup ids in row {i}"
    allowed = jnp.asarray([[1]] * 8, dtype=jnp.int32)
    out_f = jax.jit(lambda i, v, s: ivfpq_search(i, SearchQueries(vector=v, subset_ids=s), k))(
        ivf, q, allowed
    )
    got_f = np.asarray(out_f.indices)
    valid = got_f[got_f >= 0]
    assert valid.size > 0 and (valid % 3 == 1).all()


def test_ivfpq_rerank_cache_and_factory_roundtrip(tmp_path):
    """`rerank:`/`rerank_dim:` reach the build through DenseFactoryConfig and
    the rerank store survives the orbax cache round-trip."""
    x = _corpus(n=1024)
    q = _queries(x, b=8)
    cfg = DenseFactoryConfig(
        codec="ivfpq", n_clusters=8, nprobe=8, ivf_window=128,
        kmeans_iters=3, refine="int8", refine_dim=16, keep_codes=False,
        rerank="int8", rerank_dim=32, k_factor=4,
    )
    built = build_dense_from_config(
        cfg, x, rng=jax.random.PRNGKey(0),
        cache_dir=str(tmp_path), data_fingerprint="fpR",
    )
    assert built.rerank_codes is not None and built.k_factor == 4
    loaded = build_dense_from_config(
        cfg, x, rng=jax.random.PRNGKey(0),
        cache_dir=str(tmp_path), data_fingerprint="fpR",
    )
    assert loaded.rerank_codes is not None and loaded.k_factor == 4
    fn = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), 10))
    np.testing.assert_array_equal(
        np.asarray(fn(built, q).indices), np.asarray(fn(loaded, q).indices)
    )


@pytest.mark.slow
def test_sharded_ivfpq_rerank_matches_unsharded():
    """Cell-sharded + rerank: shards pool k_factor*k window-scored candidates
    each, the merge keeps the global pool, and ONE post-merge rerank over the
    replicated store reproduces the unsharded IndexRefine result exactly."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import shard_ivfpq_index, sharded_ivfpq_search

    mesh = make_mesh((4,), ("shard",))
    x = _corpus(n=4096)
    q = _queries(x, b=8)
    k = 10
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=32, nprobe=8, window=128,
        kmeans_iters=4, keep_codes=False, refine="int8", refine_dim=16,
        rerank="float32", k_factor=4, spill=True, approx_recall=None,
    )
    ref = ivfpq_search(ivf, SearchQueries(vector=q), k)
    sh = shard_ivfpq_index(ivf, mesh)
    assert sh.rerank_codes is not None and sh.k_factor == 4
    out = sharded_ivfpq_search(sh, SearchQueries(vector=q), k)
    ref_i, got_i = np.asarray(ref.indices), np.asarray(out.indices)
    for i in range(q.shape[0]):
        valid = got_i[i][got_i[i] >= 0]
        assert len(set(valid.tolist())) == valid.size, f"dup ids in row {i}"
        assert set(got_i[i].tolist()) == set(ref_i[i].tolist()), i
    assert np.allclose(np.asarray(out.scores), np.asarray(ref.scores), atol=1e-4)
