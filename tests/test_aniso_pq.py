"""Anisotropic (score-aware / ScaNN-style) PQ training tests.

Beyond-reference quality lever: faiss (the reference's dense backend,
`vod_search/faiss_search/build_gpu.py`) trains PQ codebooks with plain
per-subspace k-means; the anisotropic objective weights quantization error
parallel to the datapoint `eta` times the orthogonal error (Guo et al.,
ICML 2020), which preserves exactly the inner products of high-scoring
queries. eta=1 must reduce to plain k-means assignment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vod_tpu.ops import pq as pq_ops


def _spectrum_corpus(rng, n, d, decay=0.6):
    spec = (1.0 / np.arange(1, d + 1) ** decay).astype(np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32) * spec
    return x / np.linalg.norm(x, axis=1, keepdims=True), spec


def test_anisotropic_eta_theorem():
    # (d-1) T^2 / (1-T^2), floored at 1
    assert pq_ops.anisotropic_eta(0.2, 768) == pytest.approx(767 * 0.04 / 0.96)
    assert pq_ops.anisotropic_eta(0.0, 768) == 1.0

    rng = np.random.default_rng(0)
    x, _ = _spectrum_corpus(rng, 2048, 64)
    xj = jnp.asarray(x)
    assert pq_ops.resolve_aniso_eta(None, xj) is None
    assert pq_ops.resolve_aniso_eta(7.5, xj) == 7.5
    # 'auto' = theorem at the data's EFFECTIVE dim (not ambient):
    pr = pq_ops.participation_ratio(xj)
    assert 1.0 < pr < 64.0  # decaying spectrum concentrates
    assert pq_ops.resolve_aniso_eta("auto", xj) == pytest.approx(
        pq_ops.anisotropic_eta(0.3, pr)
    )
    # isotropic data has effective dim ~= ambient
    iso = jnp.asarray(rng.standard_normal((4096, 32)).astype(np.float32))
    assert pq_ops.participation_ratio(iso) > 25.0


def test_eta_one_matches_plain_encoding():
    """eta=1 kills the parallel term: coordinate descent = nearest codeword."""
    rng = np.random.default_rng(0)
    x, _ = _spectrum_corpus(rng, 512, 32)
    xj = jnp.asarray(x)
    cb = pq_ops.train_pq(jax.random.PRNGKey(0), xj, 4, n_codes=16, n_iters=4)
    plain = np.asarray(pq_ops.encode_pq(cb, xj))
    aniso = np.asarray(pq_ops.encode_pq_anisotropic(cb, xj, eta=1.0, chunk=256))
    np.testing.assert_array_equal(plain, aniso)


def test_aniso_training_reduces_aniso_loss():
    rng = np.random.default_rng(1)
    x, _ = _spectrum_corpus(rng, 2048, 64)
    xj = jnp.asarray(x)
    eta = pq_ops.anisotropic_eta(0.2, 64)
    u = xj / jnp.linalg.norm(xj, axis=-1, keepdims=True)

    cb_p = pq_ops.train_pq(jax.random.PRNGKey(0), xj, 8, n_codes=16, n_iters=6)
    cb_a = pq_ops.train_pq_anisotropic(
        jax.random.PRNGKey(0), xj, 8, n_codes=16, eta=eta, n_iters=4, chunk=512
    )

    def loss(cb, aniso):
        codes = (
            pq_ops.encode_pq_anisotropic(cb, xj, eta, chunk=512)
            if aniso
            else pq_ops.encode_pq(cb, xj)
        )
        recon = pq_ops.decode_pq(cb, codes)
        return float(pq_ops._aniso_loss(xj, u, recon, eta))

    assert loss(cb_a, True) < loss(cb_p, False)


def test_aniso_candidate_recall_not_worse():
    """MIPS candidate recall (GT top-10 inside approx top-40) with score-aware
    codebooks+encoding is at least plain PQ's (the sweep that chose the default
    eta measured +1pp at this setup; assert no regression with slack)."""
    rng = np.random.default_rng(0)
    d, n, nq = 64, 4096, 128
    x, spec = _spectrum_corpus(rng, n, d)
    qi = rng.integers(0, n, nq)
    q = x[qi] + 0.35 * rng.standard_normal((nq, d)).astype(np.float32) * spec
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    xj = jnp.asarray(x)
    eta = pq_ops.anisotropic_eta(0.2, d)
    gt = np.argsort(-(q @ x.T), axis=1)[:, :10]

    def cand_recall(cb, aniso):
        codes = (
            pq_ops.encode_pq_anisotropic(cb, xj, eta, chunk=1024)
            if aniso
            else pq_ops.encode_pq(cb, xj)
        )
        recon = np.asarray(pq_ops.decode_pq(cb, codes))
        ap = np.argsort(-(q @ recon.T), axis=1)[:, :40]
        return np.mean([len(set(gt[i]) & set(ap[i])) / 10 for i in range(nq)])

    cb_p = pq_ops.train_pq(jax.random.PRNGKey(0), xj, 8, n_codes=64, n_iters=8)
    cb_a = pq_ops.train_pq_anisotropic(
        jax.random.PRNGKey(0), xj, 8, n_codes=64, eta=eta, n_iters=4, chunk=1024
    )
    assert cand_recall(cb_a, True) >= cand_recall(cb_p, False) - 0.01


def test_build_pq_index_with_aniso_searches():
    """End-to-end: aniso_eta='auto' through build_pq_index + refine search."""
    from vod_tpu.search import SearchQueries
    from vod_tpu.search.dense import build_pq_index, pq_search

    rng = np.random.default_rng(3)
    x, spec = _spectrum_corpus(rng, 1024, 64)
    q = x[:16] + 0.2 * rng.standard_normal((16, 64)).astype(np.float32) * spec
    idx = build_pq_index(
        jax.random.PRNGKey(0), jnp.asarray(x),
        n_subquantizers=8, coarse_dim=None, refine="int8", k_factor=4,
        kmeans_iters=4, aniso_eta="auto", approx_recall=None,
    )
    out = pq_search(idx, SearchQueries(vector=jnp.asarray(q)), top_k=10)
    assert out.indices.shape == (16, 10)
    assert bool(jnp.all(out.indices >= 0))
    # refine re-ranks against int8 rows: top-1 should usually be the source row
    hit = np.mean(np.asarray(out.indices[:, 0]) == np.arange(16))
    assert hit > 0.6


def test_factory_aniso_config_roundtrip(tmp_path):
    from vod_tpu.configs.search import DenseFactoryConfig

    cfg = DenseFactoryConfig(codec="pq", aniso_eta="auto")
    assert cfg.aniso_eta == "auto"
    cfg2 = DenseFactoryConfig(codec="ivfpq", aniso_eta=5.0)
    assert cfg2.aniso_eta == 5.0
