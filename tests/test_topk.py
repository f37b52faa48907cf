"""block_topk correctness (kept as an alternative selection kernel)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from vod_tpu.ops.topk import block_topk


def test_block_topk_exact() -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 5000)).astype("float32"))
    for k in (1, 10, 100):
        s, i = block_topk(x, k, block=512)
        es, ei = jax.lax.top_k(x, k)
        assert np.allclose(np.asarray(s), np.asarray(es))
        got = np.take_along_axis(np.asarray(x), np.asarray(i), axis=-1)
        assert np.allclose(got, np.asarray(es))


def test_block_topk_with_padding_and_inf() -> None:
    x = jnp.asarray([[1.0, -np.inf, 3.0, 2.0, -np.inf]])
    s, i = block_topk(x, 3, block=2)
    assert np.allclose(np.asarray(s)[0], [3.0, 2.0, 1.0])
    assert np.asarray(i)[0].tolist() == [2, 3, 0]


@pytest.mark.slow
def test_fused_mips_pallas_interpret() -> None:
    """Fused Pallas MIPS kernel: exact vs lax.top_k (interpret mode on CPU)."""
    from vod_tpu.ops.mips_pallas import fused_mips_topk

    rng = np.random.default_rng(1)
    n, d, b, k = 1024, 64, 16, 7
    v = jnp.asarray(rng.normal(size=(n, d)).astype("float32"))
    q = jnp.asarray(rng.normal(size=(b, d)).astype("float32"))
    s, i = fused_mips_topk(v, q, k=k, tile=256, qblock=8, interpret=True)
    es, ei = jax.lax.top_k(q @ v.T, k)
    assert np.allclose(np.asarray(s), np.asarray(es), atol=1e-4)
    assert np.array_equal(np.asarray(i), np.asarray(ei))
    # padding rows masked out
    s2, i2 = fused_mips_topk(v, q, k=k, tile=256, qblock=8, n_real=50, interpret=True)
    assert np.asarray(i2).max() < 50


def test_fused_mips_binned_interpret() -> None:
    """Binned fused MIPS (the fast path): matches the brute-force top-k up to
    bin collisions; with bins >= n it is exact (every row has its own bin)."""
    from vod_tpu.ops.mips_pallas import fused_mips_binned

    rng = np.random.default_rng(2)
    n, d, b, k = 1024, 64, 16, 7
    v = jnp.asarray(rng.normal(size=(n, d)).astype("float32"))
    q = jnp.asarray(rng.normal(size=(b, d)).astype("float32"))
    es, ei = jax.lax.top_k(q @ v.T, k)

    # exact regime: tile == bins -> one row per bin per tile... bins=256 with
    # tile=256 means bin(j)=j; still approximate across tiles. Check recall.
    s, i = fused_mips_binned(v, q, k=k, tile=256, qblock=8, bins=256, interpret=True)
    got, exp = np.asarray(i), np.asarray(ei)
    recall = np.mean([len(set(got[r]) & set(exp[r])) / k for r in range(b)])
    assert recall >= 1 - (k - 1) / 256, recall  # expected collision bound

    # scores of returned ids must equal their true inner products
    true = np.asarray(q @ v.T)
    fetched = np.take_along_axis(true, got, axis=-1)
    assert np.allclose(np.asarray(s), fetched, atol=1e-4)

    # the global argmax is NEVER lost (it always wins its bin)
    assert np.array_equal(got[:, 0], exp[:, 0])

    # padding rows masked out
    _, i2 = fused_mips_binned(v, q, k=k, tile=256, qblock=8, bins=256, n_real=50, interpret=True)
    assert np.asarray(i2).max() < 50


def test_dense_search_fused_kernel_path() -> None:
    """`kernel='fused'` on a flat index routes through the Pallas kernel
    (interpret-mode on CPU) and agrees with brute force up to bin collisions;
    padded rows and the id offset are honored."""
    from vod_tpu.search import SearchQueries, build_dense_index
    from vod_tpu.search.dense import dense_search

    rng = np.random.default_rng(5)
    n, d, b, k = 700, 32, 5, 5  # n pads to 1024, b pads to 16
    v = jnp.asarray(rng.normal(size=(n, d)).astype("float32"))
    q = jnp.asarray(rng.normal(size=(b, d)).astype("float32"))
    ix = build_dense_index(v, dtype="float32", kernel="fused", offset=100)
    out = dense_search(ix, SearchQueries(vector=q), top_k=k)
    assert out.indices.shape == (b, k)
    got = np.asarray(out.indices) - 100
    assert got.min() >= 0 and got.max() < n
    exact = np.asarray(jax.lax.top_k(q @ v.T, k)[1])
    # the top-1 always survives binning; scores are true inner products
    assert np.array_equal(got[:, 0], exact[:, 0])
    true = np.asarray(q @ v.T)
    fetched = np.take_along_axis(true, got, axis=-1)
    assert np.allclose(np.asarray(out.scores), fetched, atol=1e-4)


def test_dense_search_fused_int8_path() -> None:
    """int8 codec + kernel='fused': int32 in-kernel accumulation, per-row query
    scale applied post-kernel; agrees with the int8 scan path on the same index
    data (both score the same quantized corpus)."""
    from vod_tpu.search import SearchQueries, build_dense_index
    from vod_tpu.search.dense import dense_search

    rng = np.random.default_rng(9)
    n, d, b, k = 600, 64, 8, 5
    v = rng.normal(size=(n, d)).astype("float32")
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    q = jnp.asarray(v[rng.integers(0, n, b)] + 0.03 * rng.normal(size=(b, d)).astype("float32"))

    fused = build_dense_index(jnp.asarray(v), dtype="int8", kernel="fused")
    scan = build_dense_index(jnp.asarray(v), dtype="int8")
    out_f = dense_search(fused, SearchQueries(vector=q), top_k=k)
    out_s = dense_search(scan, SearchQueries(vector=q), top_k=k)
    # top-1 must agree exactly (always survives binning); scores must match
    # where ids agree (same int8 codes -> same quantized scores)
    got_f, got_s = np.asarray(out_f.indices), np.asarray(out_s.indices)
    assert np.array_equal(got_f[:, 0], got_s[:, 0])
    overlap = np.mean([len(set(got_f[i]) & set(got_s[i])) / k for i in range(b)])
    assert overlap >= 0.8, overlap
    for i in range(b):
        common = set(got_f[i]) & set(got_s[i])
        sf = {int(ix): float(s) for ix, s in zip(got_f[i], np.asarray(out_f.scores)[i])}
        ss = {int(ix): float(s) for ix, s in zip(got_s[i], np.asarray(out_s.scores)[i])}
        for ix in common:
            assert abs(sf[ix] - ss[ix]) < 1e-3, (ix, sf[ix], ss[ix])


@pytest.mark.slow
def test_sharded_fused_kernel_matches_unsharded() -> None:
    """`kernel='fused'` on the sharded engine (8-device CPU mesh): the Pallas
    kernel runs per shard with a TRACED per-shard validity bound, the
    all_gather(k) merge assembles global ids; agrees with the unsharded fused
    engine on top-1 and returns true global scores."""
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import SearchQueries, build_dense_index
    from vod_tpu.search.dense import dense_search
    from vod_tpu.search.sharded import build_sharded_dense_index, sharded_dense_search

    rng = np.random.default_rng(13)
    n, d, b, k = 3000, 32, 6, 5  # pads to 8 shards x 1024 rows
    v = rng.normal(size=(n, d)).astype("float32")
    q = jnp.asarray(rng.normal(size=(b, d)).astype("float32"))

    mesh = make_mesh((8,), ("shard",))
    for dtype in ("float32", "int8"):
        sharded = build_sharded_dense_index(
            jnp.asarray(v), mesh, dtype=dtype, kernel="fused")
        out = sharded_dense_search(sharded, SearchQueries(vector=q), top_k=k)
        ids = np.asarray(out.indices)
        assert ids.shape == (b, k) and ids.max() < n
        exact = np.asarray(jax.lax.top_k(q @ v.T, k)[1]) if dtype == "float32" else None
        if exact is not None:
            # top-1 wins its bin on its shard and the cross-shard merge
            assert np.array_equal(ids[:, 0], exact[:, 0])
            true = np.asarray(q @ v.T)
            fetched = np.take_along_axis(true, ids, axis=-1)
            assert np.allclose(np.asarray(out.scores), fetched, atol=2e-2)
        else:
            # int8: compare against the unsharded int8 fused engine's top-1
            single = build_dense_index(jnp.asarray(v), dtype="int8", kernel="fused")
            ref = dense_search(single, SearchQueries(vector=q), top_k=k)
            assert np.array_equal(ids[:, 0], np.asarray(ref.indices)[:, 0])
