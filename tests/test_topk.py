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
