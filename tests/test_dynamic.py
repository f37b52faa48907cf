"""Dynamic (mutable) dense index: add/delete/upsert/compact semantics and
search correctness vs brute force.

Parity: ES bulk ingestion (`es_search/client.py:335`), qdrant upsert/delete
(`qdrant_search/client.py:430`), faiss chunked `add` (`build.py:51-81`) — the
reference's engines mutate; the TPU store does it with capacity-padded arrays
and a traced fill level (no recompiles per update)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vod_tpu.search.base import SearchQueries
from vod_tpu.search.dynamic import (
    DynamicDenseIndex,
    dynamic_add,
    dynamic_compact,
    dynamic_delete,
    dynamic_from_dense,
    dynamic_index_init,
    dynamic_search,
    dynamic_update,
)


def _vecs(rng, n, d=16):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _search_ids(index, q, k=5, subset_ids=None):
    out = dynamic_search(
        index,
        SearchQueries(
            vector=jnp.asarray(q),
            subset_ids=None if subset_ids is None else jnp.asarray(subset_ids, jnp.int32),
        ),
        top_k=k,
    )
    return np.asarray(out.indices), np.asarray(out.scores)


def test_add_then_search_matches_bruteforce():
    rng = np.random.default_rng(0)
    x = _vecs(rng, 50)
    index = dynamic_from_dense(jnp.asarray(x), capacity=256, dtype="float32", approx_recall=None)
    q = _vecs(rng, 4)
    ids, scores = _search_ids(index, q, k=5)
    expect = q @ x.T
    for i in range(4):
        best = np.argsort(-expect[i])[:5]
        np.testing.assert_array_equal(ids[i], best)
        np.testing.assert_allclose(scores[i], expect[i, best], rtol=1e-3)


def test_incremental_add_visible_and_ids_autoassigned():
    rng = np.random.default_rng(1)
    x = _vecs(rng, 10)
    index = dynamic_index_init(128, 16, dtype="float32", approx_recall=None)
    index, ids1 = jax.jit(dynamic_add)(index, jnp.asarray(x[:6]))
    np.testing.assert_array_equal(np.asarray(ids1), np.arange(6))
    index, ids2 = jax.jit(dynamic_add)(index, jnp.asarray(x[6:]))
    np.testing.assert_array_equal(np.asarray(ids2), np.arange(6, 10))
    # the new rows are searchable: query each row by itself
    got, _ = _search_ids(index, x, k=1)
    np.testing.assert_array_equal(got[:, 0], np.arange(10))


def test_add_count_masks_invalid_tail():
    rng = np.random.default_rng(2)
    x = _vecs(rng, 8)
    index = dynamic_index_init(128, 16, dtype="float32", approx_recall=None)
    index, ids = dynamic_add(index, jnp.asarray(x), count=jnp.asarray(5))
    assert (np.asarray(ids)[5:] == -1).all()
    assert int(index.n_alive) == 5
    got, scores = _search_ids(index, x[6:7], k=8)
    assert (got[0][np.isfinite(scores[0])] < 5).all()  # rows 5..7 never surface


def test_capacity_overflow_drops_not_clobbers():
    rng = np.random.default_rng(3)
    x = _vecs(rng, 10)
    index = dynamic_from_dense(jnp.asarray(x), capacity=128, dtype="float32", approx_recall=None)
    extra = _vecs(rng, 130)
    index, ids = dynamic_add(index, jnp.asarray(extra))
    dropped = np.asarray(ids) == -1
    assert dropped.sum() == 12  # 10 + 130 - 128 slots
    # the original rows survive untouched
    got, _ = _search_ids(index, x, k=1)
    np.testing.assert_array_equal(got[:, 0], np.arange(10))


def test_delete_tombstones_and_compact_preserves_ids():
    rng = np.random.default_rng(4)
    x = _vecs(rng, 20)
    index = dynamic_from_dense(jnp.asarray(x), capacity=128, dtype="float32", approx_recall=None)
    index = jax.jit(dynamic_delete)(index, jnp.asarray([3, 7, -1], jnp.int32))
    assert int(index.n_alive) == 18
    got, _ = _search_ids(index, x[[3, 7]], k=3)
    assert 3 not in got[0] and 7 not in got[1]

    before, _ = _search_ids(index, x[:5], k=5)
    index2 = jax.jit(dynamic_compact)(index)
    assert int(index2.n_active) == 18
    after, _ = _search_ids(index2, x[:5], k=5)
    np.testing.assert_array_equal(before, after)  # ids stable across compaction

    # reclaimed slots are reusable: add 2 new rows after compaction
    y = _vecs(rng, 2)
    index3, new_ids = dynamic_add(index2, jnp.asarray(y))
    got, _ = _search_ids(index3, y, k=1)
    np.testing.assert_array_equal(got[:, 0], np.asarray(new_ids))


def test_update_overwrites_existing_by_id():
    rng = np.random.default_rng(5)
    x = _vecs(rng, 12)
    index = dynamic_from_dense(jnp.asarray(x), capacity=128, dtype="float32", approx_recall=None)
    new_vec = _vecs(rng, 2)
    index, found = jax.jit(dynamic_update)(
        index, jnp.asarray([4, 99], jnp.int32), jnp.asarray(new_vec)
    )
    np.testing.assert_array_equal(np.asarray(found), [True, False])
    got, scores = _search_ids(index, new_vec[:1], k=1)
    assert got[0, 0] == 4  # id 4 now holds the new vector
    assert scores[0, 0] == pytest.approx(1.0, abs=1e-3)


def test_subset_filtering_on_dynamic_rows():
    rng = np.random.default_rng(6)
    x = _vecs(rng, 16)
    index = dynamic_index_init(128, 16, dtype="float32", approx_recall=None)
    sub = np.asarray([i % 2 for i in range(16)], np.int32)
    index, _ = dynamic_add(index, jnp.asarray(x), subset_ids=jnp.asarray(sub))
    ids, scores = _search_ids(index, x[:4], k=8, subset_ids=np.ones((4, 1), np.int32))
    valid = ids[np.isfinite(scores)]
    assert (valid % 2 == 1).all()  # only subset-1 rows


def test_int8_dynamic_store_close_to_float():
    rng = np.random.default_rng(7)
    x = _vecs(rng, 60)
    index = dynamic_from_dense(jnp.asarray(x), capacity=256, dtype="int8", approx_recall=None)
    # new rows quantize with the frozen scale and are still searchable
    y = _vecs(rng, 4)
    index, ids = dynamic_add(index, jnp.asarray(y))
    got, scores = _search_ids(index, y, k=1)
    np.testing.assert_array_equal(got[:, 0], np.asarray(ids))
    assert (scores[:, 0] > 0.9).all()  # self-similarity survives int8


def test_add_jit_no_recompile_across_updates():
    """The add/search ops trace once: n_active is a traced scalar, not a
    static shape — updates must not trigger recompiles."""
    rng = np.random.default_rng(8)
    index = dynamic_index_init(256, 16, dtype="float32", approx_recall=None)
    add = jax.jit(dynamic_add)
    # warm up (first call compiles; a second may re-specialize committed inputs)
    for _ in range(2):
        index, _ = add(index, jnp.asarray(_vecs(rng, 8)))
    steady = add._cache_size()
    for _ in range(2):
        index, _ = add(index, jnp.asarray(_vecs(rng, 8)))
    assert add._cache_size() == steady  # no per-update recompiles
    assert int(index.n_alive) == 32
