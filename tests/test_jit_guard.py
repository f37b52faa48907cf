"""The relay-literal trap, made structurally detectable (VERDICT r4 #8).

Round 4 measured that a jitted function CLOSING OVER a device array ships it
to the remote compiler as a program literal at ~100 s/MB (2.3 MB literal =
252 s compile; as a jit argument = 1.6 s). These tests (a) reproduce the
pattern and prove the guard catches it, and (b) audit the repo's hot jit
entry points — the public search functions and the driver's `entry()` — to
prove they take their big arrays as ARGUMENTS, so the next big-array closure
fails here instead of silently stalling a TPU run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vod_tpu.search import SearchQueries, build_dense_index
from vod_tpu.search.dense import dense_search, pq_search
from vod_tpu.search.factory import build_dense_from_config
from vod_tpu.configs.search import DenseFactoryConfig
from vod_tpu.utils.jit_guard import (
    JitLiteralError,
    assert_no_big_consts,
    closed_const_bytes,
    guarded_jit,
)

# 4 MB f32: big enough that closing over it would cost ~minutes of relay
# compile, small enough to trace instantly at XLA-CPU in this suite
_BIG = jnp.asarray(np.random.default_rng(0).normal(size=(1024, 1024)).astype(np.float32))


def test_closure_over_big_array_is_caught():
    def bad(q):  # the r4 trap: index baked into the program as a literal
        return (q @ _BIG).sum()

    q = jnp.ones((8, 1024), jnp.float32)
    total, sizes = closed_const_bytes(bad, q)
    assert total >= _BIG.nbytes
    with pytest.raises(JitLiteralError, match="jit ARGUMENTS"):
        assert_no_big_consts(bad, q)


def test_array_as_argument_passes():
    def good(big, q):
        return (q @ big).sum()

    q = jnp.ones((8, 1024), jnp.float32)
    assert_no_big_consts(good, _BIG, q)  # no raise
    total, _ = closed_const_bytes(good, _BIG, q)
    assert total < 1 << 20


def test_small_closure_constants_are_fine():
    table = jnp.arange(128, dtype=jnp.float32)  # 512 B lookup table: fine

    def fn(q):
        return q * table.sum()

    assert_no_big_consts(fn, jnp.ones((4,), jnp.float32))


def test_guarded_jit_raises_then_matches_plain_jit():
    def bad(q):
        return (q @ _BIG).sum()

    q = jnp.ones((8, 1024), jnp.float32)
    with pytest.raises(JitLiteralError):
        guarded_jit(bad)(q)

    def good(big, q):
        return (q @ big).sum()

    g = guarded_jit(good)
    np.testing.assert_allclose(
        np.asarray(g(_BIG, q)), np.asarray(jax.jit(good)(_BIG, q)), rtol=1e-6
    )


def test_search_entry_points_take_index_as_argument():
    """The library search paths must never close over their index buffers —
    they all take the index as the first jit argument."""
    emb = jnp.asarray(np.random.default_rng(1).normal(size=(4096, 256)).astype(np.float32))
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    q = emb[:8]

    flat = build_dense_index(emb, dtype="bfloat16")
    assert_no_big_consts(
        lambda ix, v: dense_search(ix, SearchQueries(vector=v), top_k=5).indices,
        flat, q, name="dense_search",
    )

    serving = build_dense_from_config(
        DenseFactoryConfig(
            codec="pq", coarse_dim=64, refine="int8", refine_dim=128,
            keep_codes=False, k_factor=4, train_size=2048,
        ),
        emb, rng=jax.random.PRNGKey(0),
    )
    assert_no_big_consts(
        lambda ix, v: pq_search(ix, SearchQueries(vector=v), top_k=5).indices,
        serving, q, name="pq_search (serving codec)",
    )


def test_driver_entry_fn_has_no_big_literals():
    """__graft_entry__.entry() is the driver's compile-check target — its fn
    must take params/batch as arguments, not close over device buffers."""
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    assert_no_big_consts(fn, *example_args, name="__graft_entry__.entry")
