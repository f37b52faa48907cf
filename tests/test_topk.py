"""block_topk correctness (kept as an alternative selection kernel)."""
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
