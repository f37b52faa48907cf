"""Mesh/sharding tests: FSDP rules, TP-sharded forward equals replicated."""
import numpy as np
import jax
import jax.numpy as jnp

from vod_tpu.models import Ranker, RetrievalGradients, TransformerEncoderConfig, VodPoolerConfig
from vod_tpu.parallel import fsdp_sharding, make_mesh, shard_params, shard_params_tp


def _model():
    cfg = TransformerEncoderConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        dtype=jnp.float32, pooler=VodPoolerConfig(agg_method="mean"),
    )
    return Ranker(cfg=cfg, gradients=RetrievalGradients())


def test_tp_sharded_forward_matches_replicated() -> None:
    model = _model()
    ids = jnp.ones((4, 8), dtype="int32")
    mask = jnp.ones((4, 8), dtype="int32")
    params = model.init(jax.random.PRNGKey(0), ids, mask, method=Ranker.encode_field)
    ref = np.asarray(model.apply(params, ids, mask, method=Ranker.encode_field))

    mesh = make_mesh((2, 4), ("dp", "tp"))
    params_tp = shard_params_tp(params, mesh, axis="tp")
    # at least the FFN kernels must actually be tp-sharded
    flat = jax.tree_util.tree_flatten_with_path(params_tp)[0]
    sharded = [
        p for p, v in flat
        if "intermediate" in jax.tree_util.keystr(p) and "kernel" in jax.tree_util.keystr(p)
        and "tp" in str(v.sharding)
    ]
    assert sharded, "FFN kernels not tp-sharded"
    out = np.asarray(jax.jit(lambda p, i, m: model.apply(p, i, m, method=Ranker.encode_field))(params_tp, ids, mask))
    assert np.allclose(out, ref, atol=1e-5)


def test_fsdp_rule_shards_large_params() -> None:
    mesh = make_mesh((1, 8), ("dp", "fsdp"))
    params = {"emb": jnp.zeros((64, 32)), "tiny": jnp.zeros((4,)), "scalar": jnp.zeros(())}
    shardings = fsdp_sharding(params, mesh)
    assert "fsdp" in str(shardings["emb"].spec)
    assert shardings["tiny"].spec == jax.sharding.PartitionSpec()
    p2 = shard_params(params, mesh)
    assert np.allclose(np.asarray(p2["emb"]), 0)
