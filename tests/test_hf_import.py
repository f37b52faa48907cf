"""HF BERT -> flax encoder weight-port parity: outputs must match torch."""
import numpy as np
import jax
import jax.numpy as jnp


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
