"""Mesh/sharding tests: FSDP rules, TP-sharded forward equals replicated."""
import os

import numpy as np
import pytest
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


@pytest.mark.slow
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
        and "tp" in str(v.sharding.spec)
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


@pytest.mark.slow
def test_mesh_aware_training_loop_matches_single_device() -> None:
    """Multi-step training on a dp x fsdp x tp mesh: the loop dp-shards the
    incoming batches, params are fsdp+tp sharded, metrics accumulate on device
    — and losses/metrics match a single-device run on the same data + rng
    (parity: reference whole-training DDP/FSDP runs, `vod_exps/init.py:40,55`).
    """
    import optax

    from vod_tpu.parallel import make_mesh, shard_batch, shard_params_combined
    from vod_tpu.runtime import DeviceCorpus, QueryBatch, TrainerState
    from vod_tpu.runtime.train import make_train_step, training_loop
    from vod_tpu.search import HybridEngines, build_dense_index, build_sharded_dense_index

    rng_np = np.random.default_rng(7)
    n_corpus, ls, lq, b, n_steps = 128, 8, 6, 8, 4
    vocab = 64
    topics = rng_np.integers(4, vocab, size=(n_corpus, 3))
    sec = np.stack([rng_np.choice(topics[i], size=ls) for i in range(n_corpus)]).astype("int32")
    corpus = DeviceCorpus(
        input_ids=jnp.asarray(sec),
        attention_mask=jnp.ones((n_corpus, ls), "int32"),
        subset_ids=jnp.asarray((np.arange(n_corpus) % 2).astype("int32")),
    )

    def make_batches(n):
        out = []
        for s in range(n):
            r = np.random.default_rng(100 + s)
            gold = r.integers(0, n_corpus, size=b)
            q = np.stack([r.choice(topics[g], size=lq) for g in gold]).astype("int32")
            out.append(QueryBatch(
                input_ids=jnp.asarray(q),
                attention_mask=jnp.ones((b, lq), "int32"),
                section_ids=jnp.asarray(gold[:, None].astype("int32")),
            ))
        return out

    emb = jnp.asarray(rng_np.normal(size=(n_corpus, 32)), dtype=jnp.float32)

    def run(mesh):
        cfg = TransformerEncoderConfig(
            vocab_size=vocab, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, dtype=jnp.float32,
            pooler=VodPoolerConfig(agg_method="mean", output_norm="l2", scaler=8.0),
        )
        model = Ranker(cfg=cfg, gradients=RetrievalGradients())
        tx = optax.adam(1e-3)
        step_fn = make_train_step(model, tx, prefetch=8, n_sections=2, max_pos_sections=1)
        if mesh is not None:
            engines = HybridEngines(
                dense=build_sharded_dense_index(emb, mesh, axis="fsdp",
                                                dtype="float32", approx_recall=None)
            )
        else:
            engines = HybridEngines(
                dense=build_dense_index(emb, dtype="float32", approx_recall=None)
            )
        from vod_tpu.runtime.collate import device_collate

        q0 = make_batches(1)[0]
        init_batch, _ = device_collate(
            jax.random.PRNGKey(0), engines, corpus, q0,
            query_vectors=jnp.zeros((b, 32)), prefetch=8, n_sections=2, max_pos_sections=1,
        )
        params = model.init(jax.random.PRNGKey(0), init_batch, mode="evaluate")
        if mesh is not None:
            params = shard_params_combined(params, mesh)
        opt_state = tx.init(params)
        logs = []
        state = TrainerState(max_steps=n_steps)
        params, opt_state, state, last = training_loop(
            step_fn=step_fn, params=params, opt_state=opt_state, engines=engines,
            corpus=corpus, train_queries=iter(make_batches(n_steps)), state=state,
            rng=jax.random.PRNGKey(5), log_interval=1, prefetch_batches=0,
            metrics=("mrr", "hitrate_3"), mesh=mesh,
            on_log=lambda s, m: logs.append(m),
        )
        return logs

    mesh = make_mesh((2, 2, 2), ("dp", "fsdp", "tp"))
    logs_mesh = run(mesh)
    logs_single = run(None)
    assert len(logs_mesh) == n_steps
    for lm, ls_ in zip(logs_mesh, logs_single):
        assert np.isclose(lm["loss"], ls_["loss"], atol=2e-3), (lm["loss"], ls_["loss"])
        assert np.isclose(lm["mrr"], ls_["mrr"], atol=2e-2), (lm["mrr"], ls_["mrr"])
    # params actually changed across steps (losses differ between fresh batches,
    # so per-step loss isn't monotone; learning itself is covered by
    # test_end_to_end_training_improves_retrieval)
    assert not np.isclose(logs_mesh[-1]["loss"], logs_mesh[0]["loss"])


@pytest.mark.slow
def test_two_process_dryrun() -> None:
    """Real 2-process jax.distributed run on localhost (VERDICT r2 #5):
    coordination service, cross-process mesh, per-process data feeding,
    psum'd grads == single-process SGD, multihost orbax save/restore."""
    import pathlib
    import subprocess
    import sys

    script = pathlib.Path(__file__).parent.parent / "examples" / "multiprocess_dryrun.py"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, str(script), "--launch", "2"],
        capture_output=True, text=True, timeout=560, env=env,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "MULTIPROCESS-DRYRUN-OK" in out.stdout


def _encoder_setup(num_layers: int = 4, seq: int = 16):
    from vod_tpu.models.encoder import TransformerEncoder

    cfg = TransformerEncoderConfig(
        vocab_size=64, hidden_size=32, num_layers=num_layers, num_heads=4,
        intermediate_size=64, dtype=jnp.float32,
        pooler=VodPoolerConfig(agg_method="mean"),
    )
    enc = TransformerEncoder(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 64, (8, seq)).astype("int32"))
    mask = jnp.asarray((rng.random((8, seq)) > 0.2).astype("int32"))
    mask = mask.at[0].set(0)  # one fully-masked row: flax's finite masking
    #                           degrades it to uniform attention — sp/pp must match
    params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]
    ref = np.asarray(jax.jit(lambda p: enc.apply({"params": p}, ids, mask))(params))
    return cfg, enc, params, ids, mask, ref


def test_pipeline_parallel_forward_matches_sequential() -> None:
    """GPipe pipeline over 4 stages == the sequential layer stack, bit-path
    identical params; also with n_micro > n_stages."""
    from vod_tpu.parallel.pipeline import pp_encoder_forward

    cfg, _enc, params, ids, mask, ref = _encoder_setup()
    mesh = make_mesh((4, 2), ("pp", "dp"))
    out = np.asarray(
        jax.jit(lambda p: pp_encoder_forward(p, cfg, ids, mask, mesh=mesh))(params)
    )
    assert np.allclose(out, ref, atol=1e-5), np.abs(out - ref).max()
    out8 = np.asarray(
        jax.jit(lambda p: pp_encoder_forward(p, cfg, ids, mask, mesh=mesh, n_micro=8))(params)
    )
    assert np.allclose(out8, ref, atol=1e-5)


def test_pipeline_parallel_grads_match_sequential() -> None:
    """AD through scan+ppermute == sequential grads (the backward pipeline)."""
    from vod_tpu.models.encoder import TransformerEncoder
    from vod_tpu.parallel.pipeline import pp_encoder_forward

    cfg, enc, params, ids, mask, _ref = _encoder_setup(num_layers=2)
    mesh = make_mesh((2, 4), ("pp", "dp"))

    def loss_seq(p):
        return jnp.sum(enc.apply({"params": p}, ids, mask) ** 2)

    def loss_pp(p):
        return jnp.sum(pp_encoder_forward(p, cfg, ids, mask, mesh=mesh) ** 2)

    g_seq = jax.jit(jax.grad(loss_seq))(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_seq)
    flat_p, _ = jax.tree_util.tree_flatten(g_pp)
    for a, b in zip(flat_s, flat_p):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4), (
            np.abs(np.asarray(a) - np.asarray(b)).max()
        )


def test_ring_attention_matches_full_attention() -> None:
    """Sequence-sharded ring attention == unsharded softmax(QK^T)V with
    padding-key masking."""
    from vod_tpu.parallel.ring import ring_attention

    rng = np.random.default_rng(1)
    b, t, h, dh = 2, 32, 4, 8
    q = jnp.asarray(rng.standard_normal((b, t, h, dh), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, dh), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, dh), dtype=np.float32))
    kv_mask = jnp.asarray(rng.random((b, t)) > 0.25)

    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * dh**-0.5
    s = jnp.where(kv_mask[:, None, None, :], s, -jnp.inf)
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, axis=-1), v)

    mesh = make_mesh((8,), ("sp",))
    out = jax.jit(
        lambda qq, kk, vv: ring_attention(qq, kk, vv, mesh=mesh, kv_mask=kv_mask)
    )(q, k, v)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sp_encoder_forward_matches_sequential() -> None:
    """Full encoder with ring attention over an sp axis == the flax forward."""
    from vod_tpu.parallel.ring import sp_encoder_forward

    cfg, _enc, params, ids, mask, ref = _encoder_setup(num_layers=2, seq=16)
    mesh = make_mesh((4, 2), ("sp", "dp"))
    out = np.asarray(
        jax.jit(lambda p: sp_encoder_forward(p, cfg, ids, mask, mesh=mesh))(params)
    )
    assert np.allclose(out, ref, atol=1e-4), np.abs(out - ref).max()


def test_moe_ffn_ep_sharded_matches_replicated() -> None:
    """Expert-parallel MoE FFN: ep-sharded weights produce the same outputs as
    replicated, the gate routes (aux loss finite), and overflow tokens fall
    through to zero rather than corrupting other experts' slots."""
    from vod_tpu.parallel.moe import MoEFFN, ep_sharding, shard_params_ep

    rng = np.random.default_rng(0)
    b, t, h = 2, 16, 32
    x = jnp.asarray(rng.standard_normal((b, t, h), dtype=np.float32))
    moe = MoEFFN(n_experts=4, intermediate_size=64, top_k=2, dtype=jnp.float32)
    params = moe.init(jax.random.PRNGKey(0), x)
    y_ref, aux_ref = jax.jit(lambda p, xx: moe.apply(p, xx))(params, x)
    assert np.isfinite(float(aux_ref)) and float(aux_ref) > 0

    mesh = make_mesh((4, 2), ("ep", "dp"))
    params_ep = shard_params_ep(params, mesh, axis="ep")
    flat = jax.tree_util.tree_flatten_with_path(params_ep)[0]
    sharded = [p for p, v in flat if "wi" in jax.tree_util.keystr(p) and "ep" in str(v.sharding.spec)]
    assert sharded, "expert weights not ep-sharded"
    y_ep, aux_ep = jax.jit(lambda p, xx: moe.apply(p, xx))(params_ep, x)
    assert np.allclose(np.asarray(y_ep), np.asarray(y_ref), atol=1e-5)
    assert np.isclose(float(aux_ep), float(aux_ref), atol=1e-5)

    # tiny capacity: outputs stay finite and some tokens are zero (dropped)
    moe_tight = MoEFFN(n_experts=4, intermediate_size=64, top_k=1,
                       capacity_factor=0.25, dtype=jnp.float32)
    p2 = moe_tight.init(jax.random.PRNGKey(1), x)
    y2, _ = jax.jit(lambda p, xx: moe_tight.apply(p, xx))(p2, x)
    norms = np.linalg.norm(np.asarray(y2), axis=-1)
    assert np.all(np.isfinite(np.asarray(y2)))
    assert (norms == 0).any(), "expected overflow tokens to be dropped to zero"


def test_ring_attention_grads_match_full_attention() -> None:
    """AD through the K/V ring (scan + ppermute) == grads of the unsharded
    softmax attention, for q, k and v."""
    from vod_tpu.parallel.ring import ring_attention

    rng = np.random.default_rng(2)
    b, t, h, dh = 2, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((b, t, h, dh), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, dh), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, dh), dtype=np.float32))
    kv_mask = jnp.asarray(rng.random((b, t)) > 0.25)
    neg = jnp.finfo(jnp.float32).min

    def loss_ref(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * dh**-0.5
        s = jnp.where(kv_mask[:, None, None, :], s, neg)
        out = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, axis=-1), v)
        return jnp.sum(out**2)

    mesh = make_mesh((8,), ("sp",))

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh=mesh, kv_mask=kv_mask) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, bb in zip(g_ref, g_ring):
        assert np.allclose(np.asarray(a), np.asarray(bb), atol=1e-4), (
            np.abs(np.asarray(a) - np.asarray(bb)).max()
        )
