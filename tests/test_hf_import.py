"""HF BERT -> flax encoder weight-port parity: outputs must match torch."""
import pytest
import os
import numpy as np
import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_bert_port_output_parity() -> None:
    import torch
    import transformers

    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch_model = transformers.BertModel(hf_cfg).eval()

    from vod_tpu.models.encoder import TransformerEncoder
    from vod_tpu.models.hf_import import config_from_hf, port_bert_weights

    cfg = config_from_hf(hf_cfg)
    params = port_bert_weights(torch_model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, size=(2, 10)).astype("int64")
    mask = np.ones((2, 10), dtype="int64")
    mask[1, 7:] = 0

    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    got = TransformerEncoder(cfg).apply(
        {"params": params}, jnp.asarray(ids.astype("int32")), jnp.asarray(mask.astype("int32"))
    )
    got = np.asarray(got, dtype="float32")
    # valid positions must match tightly
    valid = mask.astype(bool)
    diff = np.abs(got - ref)[valid]
    assert diff.max() < 2e-4, diff.max()


def test_t5_encoder_port_output_parity() -> None:
    import torch
    import transformers

    hf_cfg = transformers.T5Config(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=32,
        dropout_rate=0.0, feed_forward_proj="relu",
    )
    torch_model = transformers.T5EncoderModel(hf_cfg).eval()

    from vod_tpu.models.t5_encoder import T5Encoder, port_t5_encoder_weights, t5_config_from_hf

    cfg = t5_config_from_hf(hf_cfg)
    params = port_t5_encoder_weights(torch_model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 256, size=(2, 12)).astype("int64")
    mask = np.ones((2, 12), dtype="int64")
    mask[1, 9:] = 0

    import torch as _t

    with _t.no_grad():
        ref = torch_model(
            input_ids=_t.from_numpy(ids), attention_mask=_t.from_numpy(mask)
        ).last_hidden_state.numpy()

    got = np.asarray(
        T5Encoder(cfg).apply(
            {"params": params}, jnp.asarray(ids.astype("int32")), jnp.asarray(mask.astype("int32"))
        ),
        dtype="float32",
    )
    valid = mask.astype(bool)
    diff = np.abs(got - ref)[valid]
    assert diff.max() < 2e-4, diff.max()


@pytest.mark.slow
def test_t5_seq2seq_port_and_generation() -> None:
    """Full T5ForConditionalGeneration port: teacher-forced logits match torch
    (incl. tied-lm-head d_model**-0.5 scaling + causal relative bucketing), and
    KV-cached greedy generation matches both a naive full-recompute decode and
    HF's own `generate`."""
    import torch
    import transformers

    hf_cfg = transformers.T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=32,
        dropout_rate=0.0, feed_forward_proj="relu", decoder_start_token_id=0,
    )
    torch_model = transformers.T5ForConditionalGeneration(hf_cfg).eval()

    from vod_tpu.models.seq2seq import Seq2SeqLM, generate, port_t5_seq2seq_weights
    from vod_tpu.models.t5_encoder import t5_config_from_hf

    cfg = t5_config_from_hf(hf_cfg)
    params = {"params": port_t5_seq2seq_weights(torch_model.state_dict(), cfg)}
    model = Seq2SeqLM(cfg)

    rng = np.random.default_rng(3)
    b, le, ld = 2, 12, 7
    enc_ids = rng.integers(2, 64, size=(b, le)).astype("int64")
    enc_mask = np.ones((b, le), dtype="int64")
    enc_mask[1, 9:] = 0
    dec_ids = np.concatenate(
        [np.zeros((b, 1), dtype="int64"), rng.integers(2, 64, size=(b, ld - 1))], axis=-1
    )
    dec_mask = np.ones((b, ld), dtype="int64")

    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(enc_ids),
            attention_mask=torch.from_numpy(enc_mask),
            decoder_input_ids=torch.from_numpy(dec_ids),
            decoder_attention_mask=torch.from_numpy(dec_mask),
        ).logits.numpy()

    as32 = lambda x: jnp.asarray(x.astype("int32"))
    got = np.asarray(
        model.apply(params, as32(enc_ids), as32(enc_mask), as32(dec_ids), as32(dec_mask)),
        dtype="float32",
    )
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()

    # --- generation: cached scan == naive recompute == HF greedy ------------
    t = 8
    toks = np.asarray(generate(model, params, as32(enc_ids), as32(enc_mask), max_new_tokens=t))

    cur = np.zeros((b, 1), dtype="int64")  # naive: re-run full decoder each step
    for _ in range(t):
        logits = np.asarray(
            model.apply(
                params, as32(enc_ids), as32(enc_mask),
                as32(cur), jnp.ones(cur.shape, jnp.int32),
            ),
            dtype="float32",
        )
        cur = np.concatenate([cur, logits[:, -1:].argmax(-1)], axis=-1)
    naive = cur[:, 1:]
    # apply the post-EOS padding convention before comparing
    for r in range(b):
        eos = np.where(naive[r] == 1)[0]
        if eos.size:
            naive[r, eos[0] + 1:] = 0
    assert np.array_equal(toks, naive), (toks, naive)

    with torch.no_grad():
        hf_out = torch_model.generate(
            input_ids=torch.from_numpy(enc_ids),
            attention_mask=torch.from_numpy(enc_mask),
            max_new_tokens=t, do_sample=False, num_beams=1,
        ).numpy()[:, 1:]  # strip decoder_start
    for r in range(b):
        n = min(hf_out.shape[1], t)
        hf_row = hf_out[r, :n]
        stop = np.where(hf_row == 1)[0]
        n_cmp = (stop[0] + 1) if stop.size else n
        assert np.array_equal(toks[r, :n_cmp], hf_row[:n_cmp]), (toks[r], hf_row)


def test_roberta_port_output_parity() -> None:
    """RoBERTa/XLM-R layout port: position-offset slicing + single token-type
    row; outputs must match torch on valid positions."""
    import torch
    import transformers

    hf_cfg = transformers.RobertaConfig(
        vocab_size=200, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=66, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0, pad_token_id=1,
    )
    torch_model = transformers.RobertaModel(hf_cfg).eval()

    from vod_tpu.models.encoder import TransformerEncoder
    from vod_tpu.models.hf_import import config_from_hf, port_roberta_weights

    cfg = config_from_hf(hf_cfg, position_offset=2)
    params = port_roberta_weights(torch_model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(2, 200, size=(2, 12)).astype("int64")
    mask = np.ones((2, 12), dtype="int64")
    mask[1, 9:] = 0
    ids[1, 9:] = hf_cfg.pad_token_id  # HF derives positions from non-pad tokens

    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    got = np.asarray(
        TransformerEncoder(cfg).apply(
            {"params": params}, jnp.asarray(ids.astype("int32")), jnp.asarray(mask.astype("int32"))
        ),
        dtype="float32",
    )
    diff = np.abs(got - ref)[mask.astype(bool)]
    assert diff.max() < 2e-4, diff.max()


@pytest.mark.slow
def test_beam_search_generation() -> None:
    """Beam search on the ported T5: num_beams=1 equals greedy; wider beams
    find sequences with >= greedy's length-penalized logprob; HF's beam output
    matches at this tiny scale."""
    import torch
    import transformers

    hf_cfg = transformers.T5Config(
        vocab_size=48, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=32,
        dropout_rate=0.0, feed_forward_proj="relu", decoder_start_token_id=0,
    )
    torch_model = transformers.T5ForConditionalGeneration(hf_cfg).eval()

    from vod_tpu.models.seq2seq import Seq2SeqLM, beam_generate, generate, port_t5_seq2seq_weights
    from vod_tpu.models.t5_encoder import t5_config_from_hf

    cfg = t5_config_from_hf(hf_cfg)
    params = {"params": port_t5_seq2seq_weights(torch_model.state_dict(), cfg)}
    model = Seq2SeqLM(cfg)

    rng = np.random.default_rng(7)
    b, le, t = 2, 10, 6
    enc_ids = rng.integers(2, 48, size=(b, le)).astype("int64")
    enc_mask = np.ones((b, le), dtype="int64")
    as32 = lambda x: jnp.asarray(x.astype("int32"))

    greedy = np.asarray(generate(model, params, as32(enc_ids), as32(enc_mask), max_new_tokens=t))
    beam1, _ = beam_generate(model, params, as32(enc_ids), as32(enc_mask), num_beams=1, max_new_tokens=t)
    assert np.array_equal(np.asarray(beam1), greedy)

    beam4, s4 = beam_generate(model, params, as32(enc_ids), as32(enc_mask), num_beams=4, max_new_tokens=t)
    _, s1 = beam_generate(model, params, as32(enc_ids), as32(enc_mask), num_beams=1, max_new_tokens=t)
    assert (np.asarray(s4) >= np.asarray(s1) - 1e-5).all()

    with torch.no_grad():
        hf_out = torch_model.generate(
            input_ids=torch.from_numpy(enc_ids), attention_mask=torch.from_numpy(enc_mask),
            max_new_tokens=t, num_beams=4, do_sample=False, early_stopping=False,
            length_penalty=1.0,
        ).numpy()[:, 1:]
    got = np.asarray(beam4)
    for r in range(b):
        n = min(hf_out.shape[1], t)
        hf_row = hf_out[r, :n]
        stop = np.where(hf_row == 1)[0]
        n_cmp = (stop[0] + 1) if stop.size else n
        assert np.array_equal(got[r, :n_cmp], hf_row[:n_cmp]), (r, got[r], hf_row)


def test_hub_checkpoint_eval_skips_cleanly_offline() -> None:
    """The cache-gated hub eval (VERDICT r2 #6) must skip with a clear message
    (exit 0) when the HF cache is absent — and run the moment one appears."""
    import pathlib
    import subprocess
    import sys

    script = pathlib.Path(__file__).parent.parent / "examples" / "hub_checkpoint_eval.py"
    out = subprocess.run(
        [sys.executable, str(script), "--model", "intfloat/e5-small-v2"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "HF_HUB_OFFLINE": "1", "TRANSFORMERS_OFFLINE": "1",
             "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SKIPPED" in out.stdout or '"recall_10"' in out.stdout
