"""Statistical tests of the priority-sampling kernels.

Mirrors reference `src/vod_dataloaders/tests/test_priority_sampling.py`: build a
random categorical + f(z), draw k samples x n_trials, assert the self-normalized
estimate is within O(1/sqrt(n_trials*k)) of the true mean; the labeled variant
additionally checks pos/neg disjointness and both label-conditional estimates.
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vod_tpu.ops import numpy_ops as npo
from vod_tpu.ops import sample


def _softmax(x: np.ndarray) -> np.ndarray:
    """NaN/-inf-safe softmax in pure numpy (row-wise, matches ops.masked_softmax)."""
    x = np.where(np.isnan(x), -np.inf, np.asarray(x, dtype="float64"))
    m = np.max(x, axis=-1, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    e = np.exp(x - m)
    s = np.sum(e, axis=-1, keepdims=True)
    return e / np.maximum(s, 1e-300)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("dtype", ["float32"])
@pytest.mark.parametrize(
    "n_trials,n,k,inf_frac",
    [
        (100, 100, 10, 0),
        (1_000, 100, 10, 0),
        (100, 100, 100, 0),
        (1_000, 100, 10, 0.5),
        (1_000, 100, 10, 0.95),
    ],
)
def test_priority_sampling(seed: int, n_trials: int, n: int, k: int, dtype: str, inf_frac: float) -> None:
    rng = np.random.default_rng(seed)
    f = rng.normal(size=n).astype(dtype)
    unorm_log_p = rng.uniform(size=n).astype(dtype)
    if inf_frac > 0:
        unorm_log_p[rng.uniform(size=n) < inf_frac] = -np.inf
    if np.all(unorm_log_p == -np.inf):
        m = rng.uniform(size=n) < (1 - inf_frac)
        unorm_log_p = np.where(m, unorm_log_p, rng.normal(size=n)).astype(dtype)

    mu = np.sum(_softmax(unorm_log_p) * f)

    # batched draw: [n_trials, n]
    scores = jnp.asarray(np.repeat(unorm_log_p[None], n_trials, axis=0))
    key = jax.random.PRNGKey(seed)
    z, log_w = jax.jit(lambda r, s: sample.priority_sampling(r, s, k=k))(key, scores)
    z, log_w = np.asarray(z), np.asarray(log_w)
    assert not np.any(np.isnan(log_w))
    assert z.shape == (n_trials, k)

    w = _softmax(log_w)
    mu_hats = np.sum(w * np.take(f, z), axis=-1)
    atol = 10.0 / np.sqrt(n_trials * k)
    assert np.isclose(mu, np.mean(mu_hats), atol=atol), (mu, np.mean(mu_hats), atol)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "n_trials,n,k_positive,k_total,label_thres",
    [
        (3_000, 32, 4, 8, 0.5),
        (3_000, 32, 4, 8, 0),
        (3_000, 32, 4, 8, 1),
    ],
)
def test_labeled_priority_sampling(
    seed: int,
    n_trials: int,
    n: int,
    k_positive: int,
    k_total: int,
    label_thres: float,
    inf_thres: float = 0.2,
    dtype: str = "float32",
) -> None:
    rng = np.random.default_rng(seed)
    f = rng.normal(size=n).astype(dtype)
    unorm_log_p = rng.uniform(size=n).astype(dtype)
    unorm_log_p[unorm_log_p < inf_thres] = -np.inf
    labels = np.where(rng.normal(size=n) > label_thres, 1, 0)

    mu_a = np.sum(_softmax(unorm_log_p[labels == 1]) * f[labels == 1]) if np.sum(labels == 1) > 0 else None
    mu_b = np.sum(_softmax(unorm_log_p[labels == 0]) * f[labels == 0]) if np.sum(labels == 0) > 0 else None

    scores = jnp.asarray(np.repeat(unorm_log_p[None], n_trials, axis=0))
    labs = jnp.asarray(np.repeat(labels[None], n_trials, axis=0))
    key = jax.random.PRNGKey(seed)
    fn = jax.jit(
        lambda r, s, l: sample.labeled_priority_sampling(
            r, s, l, k_positive=k_positive, k_total=k_total, normalized=False
        )
    )
    z_, log_w_, ls_, lse_ = fn(key, scores, labs)
    z_, log_w_, ls_ = np.asarray(z_), np.asarray(log_w_), np.asarray(ls_)
    assert not np.any(np.isnan(log_w_))
    assert lse_.shape == (n_trials, 2)

    for i in range(0, n_trials, max(1, n_trials // 50)):  # disjointness spot-check
        filled = z_[i] >= 0
        counts = collections.Counter(z_[i][filled].tolist())
        assert not counts or max(counts.values()) == 1

    f_taken = np.take(f, np.clip(z_, 0, n - 1))  # [n_trials, k_total]
    if mu_a is not None:
        wa = _softmax(np.where(ls_ == 1, log_w_, -np.inf))
        mu_a_hats = np.sum(wa * f_taken, axis=-1)
        pos_atol = 10.0 / np.sqrt(n_trials * min(k_positive, np.sum(labels == 1)))
        assert np.isclose(mu_a, np.mean(mu_a_hats), atol=pos_atol), (mu_a, np.mean(mu_a_hats), pos_atol)
    if mu_b is not None:
        wb = _softmax(np.where((ls_ == 0) & (z_ >= 0), log_w_, -np.inf))
        mu_b_hats = np.sum(wb * f_taken, axis=-1)
        neg_atol = 10.0 / np.sqrt(n_trials * min(k_total - k_positive, np.sum(labels == 0)))
        assert np.isclose(mu_b, np.mean(mu_b_hats), atol=neg_atol), (mu_b, np.mean(mu_b_hats), neg_atol)


def test_labeled_sampling_rebalances_when_negatives_short() -> None:
    """If there are fewer finite negatives than k_total - k_positive, positives fill in."""
    scores = jnp.asarray([1.0, 2.0, 3.0, 4.0, -np.inf, 0.5])
    labels = jnp.asarray([1, 1, 1, 1, 0, 0])
    z, log_w, ls, _ = sample.labeled_priority_sampling(
        jax.random.PRNGKey(0), scores, labels, k_positive=1, k_total=4, normalized=True
    )
    z, ls = np.asarray(z), np.asarray(ls)
    # only 1 finite negative -> 3 positives drawn (k_pos = 4 - 1 = 3)
    assert np.sum(ls == 1) == 3
    assert set(z[ls == 1].tolist()) <= {0, 1, 2, 3}
    # negative slot takes either the finite one or the -inf one
    assert np.sum((ls == 0) & (z >= 0)) == 1


def test_sample_search_results_shapes() -> None:
    from vod_tpu.types import RetrievalBatch

    b, k, total = 4, 20, 8
    rng = np.random.default_rng(0)
    res = RetrievalBatch(
        scores=jnp.asarray(rng.normal(size=(b, k)).astype("float32")),
        indices=jnp.asarray(rng.integers(0, 1000, size=(b, k)).astype("int32")),
        labels=jnp.asarray((rng.uniform(size=(b, k)) > 0.8).astype("int32")),
    )
    raw = {"dense": res.scores + 1.0, "sparse": res.scores - 1.0}
    out = sample.sample_search_results(
        jax.random.PRNGKey(0),
        search_results=res,
        raw_scores=raw,
        total=total,
        max_pos_sections=2,
    )
    assert out.batch.scores.shape == (b, total)
    assert out.batch.indices.shape == (b, total)
    assert out.log_weights.shape == (b, total)
    assert out.lse_pos.shape == (b,)
    assert out.raw_scores["dense"].shape == (b, total)
    # sampled ids must come from the candidate list
    for i in range(b):
        cand = set(np.asarray(res.indices)[i].tolist())
        got = set(np.asarray(out.batch.indices)[i][np.asarray(out.batch.indices)[i] >= 0].tolist())
        assert got <= cand
