"""HF GPT-2 -> flax CausalLM weight-port parity (the pretrained REALM reader).

Parity: reference `model/lm/pygmalion-350m.yaml` + `vod_systems/realm.py:20`
plug pretrained hub decoder-only LMs straight into `Realm`; here the tensors
port losslessly into the native flax layout. Torch models are instantiated
from config (random weights) so everything runs offline — the same mechanism
ports real hub checkpoints when an HF cache is present
(`examples/hub_checkpoint_eval.py` pattern).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_hf_gpt2(vocab=97, h=32, layers=2, heads=4, positions=64):
    import transformers

    cfg = transformers.GPT2Config(
        vocab_size=vocab, n_embd=h, n_layer=layers, n_head=heads,
        n_positions=positions, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    return transformers.GPT2LMHeadModel(cfg).eval()


def test_gpt2_port_logits_parity() -> None:
    import torch

    torch_model = _tiny_hf_gpt2()

    from vod_tpu.models.lm import CausalLM, gpt2_config_from_hf, port_gpt2_weights

    cfg = gpt2_config_from_hf(torch_model.config)
    assert cfg.tie_word_embeddings
    params = port_gpt2_weights(torch_model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 97, size=(2, 12)).astype("int64")
    mask = np.ones((2, 12), dtype="int64")

    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).logits.numpy()

    got = np.asarray(
        CausalLM(cfg).apply(
            {"params": params}, jnp.asarray(ids.astype("int32")), jnp.asarray(mask.astype("int32"))
        )
    )
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_gpt2_greedy_generation_matches_hf() -> None:
    import torch

    torch_model = _tiny_hf_gpt2()

    from vod_tpu.models.lm import CausalLM, gpt2_config_from_hf, lm_generate, port_gpt2_weights

    cfg = gpt2_config_from_hf(torch_model.config)
    params = {"params": port_gpt2_weights(torch_model.state_dict(), cfg)}
    model = CausalLM(cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(1, 97, size=(3, 9)).astype("int64")
    t = 8
    with torch.no_grad():
        ref = torch_model.generate(
            torch.from_numpy(ids), max_new_tokens=t, do_sample=False,
            pad_token_id=0,
        ).numpy()[:, ids.shape[1]:]

    got = np.asarray(
        lm_generate(model, params, jnp.asarray(ids.astype("int32")), max_new_tokens=t)
    )
    assert got.shape == (3, t)
    assert np.array_equal(got, ref), (got, ref)


def test_gpt2_prefill_decode_matches_full_forward() -> None:
    """The KV-cached path must agree with the teacher-forced forward, including
    right-padded prompts (each row continues compactly after its own prefix)."""
    from vod_tpu.models.lm import CausalLM, CausalLMConfig

    cfg = CausalLMConfig(
        vocab_size=50, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, max_position_embeddings=32,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    model = CausalLM(cfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 50, size=(2, 7)).astype("int32")
    mask = np.ones((2, 7), "int32")
    mask[1, 5:] = 0  # row 1 has a 5-token prompt
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))

    full = np.asarray(model.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
    logits, cache = model.apply(
        params, jnp.asarray(ids), jnp.asarray(mask), 12, method=CausalLM.prefill
    )
    assert np.allclose(np.asarray(logits), full, atol=1e-5)

    # one decode step == appending that token to the (unpadded) prompt
    nxt = jnp.asarray([7, 9], dtype=jnp.int32)
    step_logits, _ = model.apply(params, nxt, cache, method=CausalLM.decode_step)
    for row, plen in ((0, 7), (1, 5)):
        ext_ids = np.concatenate([ids[row, :plen], [int(nxt[row])]])[None]
        ext = np.asarray(
            model.apply(params, jnp.asarray(ext_ids), jnp.ones_like(ext_ids))
        )
        assert np.allclose(np.asarray(step_logits)[row], ext[0, -1], atol=1e-5)


def test_realm_trains_from_ported_gpt2_reader() -> None:
    """`Realm` trains end-to-end from a ported pretrained reader (parity:
    the reference's pretrained-LM REALM regime)."""
    import optax

    torch_model = _tiny_hf_gpt2(vocab=60, h=16, layers=1, heads=2, positions=32)

    from vod_tpu.models import Realm, RetrievalGradients, TransformerEncoderConfig, VodPoolerConfig
    from vod_tpu.models.lm import gpt2_config_from_hf, port_gpt2_weights
    from vod_tpu.types.batch import RealmBatch

    lm_cfg = gpt2_config_from_hf(torch_model.config)
    enc_cfg = TransformerEncoderConfig(
        vocab_size=60, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, dtype=jnp.float32, pooler=VodPoolerConfig(),
    )
    model = Realm(cfg=enc_cfg, lm_cfg=lm_cfg, gradients=RetrievalGradients())

    rng = np.random.default_rng(3)
    b, d, l = 2, 3, 8
    mk = lambda shape, hi: jnp.asarray(rng.integers(1, hi, size=shape).astype("int32"))
    ones = lambda shape: jnp.ones(shape, jnp.int32)
    batch = RealmBatch(
        query__input_ids=mk((b, l), 60), query__attention_mask=ones((b, l)),
        section__input_ids=mk((b * d, l), 60), section__attention_mask=ones((b * d, l)),
        lm__input_ids=mk((b, d, l), 60), lm__attention_mask=ones((b, d, l)),
        section__relevance=jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]),
        section__idx=jnp.arange(b * d, dtype=jnp.int32).reshape(b, d),
        section__score=jnp.zeros((b, d)),
        section__sparse=jnp.zeros((b, d)),
        section__dense=jnp.zeros((b, d)),
        section__log_weight=jnp.zeros((b, d)),
        section__lse_pos=jnp.zeros((b,)),
        section__lse_neg=jnp.zeros((b,)),
    )
    params = model.init(jax.random.PRNGKey(0), batch, mode="evaluate")
    # graft the ported reader over the random-init one
    params = jax.device_put(params)
    grafted = dict(params)
    grafted["params"] = dict(params["params"])
    grafted["params"]["lm"] = port_gpt2_weights(torch_model.state_dict(), lm_cfg)

    tx = optax.adam(1e-3)
    opt_state = tx.init(grafted["params"])

    @jax.jit
    def train_step(p, opt_state, batch):
        def loss_fn(pp):
            out = model.apply({"params": pp}, batch, mode="evaluate")
            return out.loss
        loss, grads = jax.value_and_grad(loss_fn)(p["params"])
        updates, opt_state = tx.update(grads, opt_state)
        return {"params": optax.apply_updates(p["params"], updates)}, opt_state, loss

    losses = []
    p = grafted
    for _ in range(5):
        p, opt_state, loss = train_step(p, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_load_hf_causal_lm_skips_cleanly_offline() -> None:
    """Hub loading needs an HF cache (zero egress here): clean failure path."""
    from vod_tpu.models.lm import load_hf_causal_lm

    try:
        cfg, params = load_hf_causal_lm("gpt2")
    except Exception:
        pytest.skip("no HF cache for gpt2 (zero-egress environment)")
    assert cfg.tie_word_embeddings and "wte" in params
