"""Tests for the weighted union-merge (mirrors reference
`src/vod_dataloaders/tests/test_merge_search_results.py`): merged scores equal the
weighted sum of engine scores; raw-score gather returns NaN for absent ids; `-1`
padding yields `-inf`/`-1` in the output."""

import jax.numpy as jnp
import numpy as np
import pytest

from vod_tpu.ops import gather_values_by_indices, merge_search_results, normalize_scores
from vod_tpu.types import RetrievalBatch


def _make_results(rng: np.random.Generator, b: int, ks: dict[str, int], n_ids: int = 50):
    out = {}
    for name, k in ks.items():
        ids = np.stack([rng.choice(n_ids, size=k, replace=False) for _ in range(b)]).astype("int32")
        scores = rng.normal(size=(b, k)).astype("float32")
        # random padding tail
        n_pad = rng.integers(0, k // 2 + 1)
        if n_pad:
            ids[:, k - n_pad :] = -1
            scores[:, k - n_pad :] = -np.inf
        out[name] = RetrievalBatch(scores=jnp.asarray(scores), indices=jnp.asarray(ids))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_merge_two_engines_weighted_sum(seed: int) -> None:
    rng = np.random.default_rng(seed)
    b = 3
    results = _make_results(rng, b, {"dense": 8, "sparse": 6})
    weights = {"dense": 0.7, "sparse": 1.3}
    merged, raw = merge_search_results(results, weights)
    merged = merged.to_numpy()

    for i in range(b):
        expected: dict[int, float] = {}
        for name, r in results.items():
            ids_i = np.asarray(r.indices)[i]
            sc_i = np.asarray(r.scores)[i]
            for j, idx in enumerate(ids_i):
                if idx < 0:
                    continue
                expected[int(idx)] = expected.get(int(idx), 0.0) + weights[name] * float(sc_i[j])
        got_ids = merged.indices[i]
        got_scores = merged.scores[i]
        got = {int(gi): float(gs) for gi, gs in zip(got_ids, got_scores) if gi >= 0}
        assert set(got) == set(expected)
        for idx, val in expected.items():
            assert np.isclose(got[idx], val, atol=1e-5), (idx, got[idx], val)
        # padding entries are -inf / -1
        pad = got_ids < 0
        assert np.all(np.isneginf(got_scores[pad]))
        # output sorted by descending score
        real = got_scores[~pad]
        assert np.all(np.diff(real) <= 1e-6)

    # raw scores: NaN where engine did not return the id, exact raw score otherwise
    for name, r in results.items():
        raw_np = np.asarray(raw[name])
        for i in range(b):
            ids_i = np.asarray(r.indices)[i]
            sc_map = {int(x): float(s) for x, s in zip(ids_i, np.asarray(r.scores)[i]) if x >= 0}
            for j, gi in enumerate(merged.indices[i]):
                if gi < 0:
                    assert np.isnan(raw_np[i, j])
                elif int(gi) in sc_map:
                    assert np.isclose(raw_np[i, j], sc_map[int(gi)], atol=1e-6)
                else:
                    assert np.isnan(raw_np[i, j])


def test_merge_carries_labels_from_lookup_engine() -> None:
    dense = RetrievalBatch(
        scores=jnp.asarray([[1.0, 2.0, 3.0]]),
        indices=jnp.asarray([[10, 11, 12]], dtype="int32"),
    )
    lookup = RetrievalBatch(
        scores=jnp.asarray([[0.0, 0.0]]),
        indices=jnp.asarray([[11, 40]], dtype="int32"),
        labels=jnp.asarray([[1, 1]], dtype="int32"),
    )
    merged, _ = merge_search_results({"dense": dense, "lookup": lookup}, {"dense": 1.0, "lookup": 1.0})
    merged = merged.to_numpy()
    lab = {int(i): int(l) for i, l in zip(merged.indices[0], merged.labels[0]) if i >= 0}
    assert lab[11] == 1
    assert lab[40] == 1
    assert lab[10] == -1 and lab[12] == -1
    # 11 appears in both -> summed score 2.0 + 0.0
    sc = {int(i): float(s) for i, s in zip(merged.indices[0], merged.scores[0]) if i >= 0}
    assert np.isclose(sc[11], 2.0)
    assert np.isclose(sc[40], 0.0)


def test_merge_traced_weights_jit() -> None:
    import jax

    rng = np.random.default_rng(0)
    results = _make_results(rng, 2, {"a": 5, "b": 5})

    @jax.jit
    def run(wa, wb):
        merged, raw = merge_search_results(results, {"a": wa, "b": wb})
        return merged.scores

    s1 = run(jnp.asarray(1.0), jnp.asarray(0.0))
    s2 = run(jnp.asarray(0.5), jnp.asarray(0.5))
    assert s1.shape == s2.shape == (2, 10)


def test_gather_values_by_indices() -> None:
    queries = jnp.asarray([[3, 7, 9], [1, 2, -1]], dtype="int32")
    keys = jnp.asarray([[9, 3, 5], [2, 4, -1]], dtype="int32")
    values = jnp.asarray([[0.9, 0.3, 0.5], [0.2, 0.4, -7.0]], dtype="float32")
    out = np.asarray(gather_values_by_indices(queries, keys, values))
    assert np.isclose(out[0, 0], 0.3)
    assert np.isnan(out[0, 1])
    assert np.isclose(out[0, 2], 0.9)
    assert np.isclose(out[1, 0], np.nan, equal_nan=True)
    assert np.isclose(out[1, 1], 0.2)
    # query -1 matches key -1 (reference parity)
    assert np.isclose(out[1, 2], -7.0)


def test_gather_from_shared_1d_keys() -> None:
    queries = jnp.asarray([[3, 5], [5, 0]], dtype="int32")
    keys = jnp.asarray([0, 3, 5], dtype="int32")
    values = jnp.asarray([10.0, 13.0, 15.0], dtype="float32")
    out = np.asarray(gather_values_by_indices(queries, keys, values))
    assert np.allclose(out, [[13.0, 15.0], [15.0, 10.0]])


def test_normalize_scores_min_subtract() -> None:
    x = jnp.asarray([[1.0, 3.0, -np.inf], [-np.inf, -np.inf, -np.inf]])
    out = np.asarray(normalize_scores(x))
    assert np.allclose(out[0, :2], [0.0, 2.0])
    assert np.isneginf(out[0, 2])
    assert np.all(np.isneginf(out[1]))


def test_retrieval_batch_add_operator() -> None:
    a = RetrievalBatch(scores=jnp.asarray([[1.0, 2.0]]), indices=jnp.asarray([[5, 7]], dtype="int32"))
    b = RetrievalBatch(scores=jnp.asarray([[0.5, 3.0]]), indices=jnp.asarray([[7, 9]], dtype="int32"))
    out = (a + b).to_numpy()
    got = {int(i): float(s) for i, s in zip(out.indices[0], out.scores[0]) if i >= 0}
    assert got == {5: 1.0, 7: 2.5, 9: 3.0}
