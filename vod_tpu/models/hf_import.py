"""Port HuggingFace BERT-family checkpoints into the flax TransformerEncoder.

Parity: the reference wraps HF encoders directly (`vod_encoder/modeling.py:261`
`VodBertEncoder` etc.), so any hub checkpoint works out of the box; here the
tensors are mapped once into the native flax layout. Supports the BERT layout
(bert-base, e5-*, contriever, BioLinkBERT, ...). RoBERTa/XLM-R differ only in
embeddings offsets and can reuse this map with `position_offset`.

Usage:
    cfg = config_from_hf(hf_model.config)
    params = port_bert_weights(hf_model.state_dict(), cfg)
    pooled = VodEncoder(cfg).apply({'params': {'backbone': params, ...}}, ids, mask)
"""

from __future__ import annotations

import typing as typ

import jax.numpy as jnp
import numpy as np

from .encoder import TransformerEncoderConfig
from .pooler import VodPoolerConfig


def config_from_hf(
    hf_config: typ.Any,
    pooler: typ.Optional[VodPoolerConfig] = None,
    dtype=jnp.float32,
    position_offset: int = 0,
) -> TransformerEncoderConfig:
    """`position_offset=2` for RoBERTa/XLM-R (their position table has two
    unused leading rows; the ported table is sliced to match arange positions)."""
    return TransformerEncoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings - position_offset,
        type_vocab_size=getattr(hf_config, "type_vocab_size", 2),
        layer_norm_eps=getattr(hf_config, "layer_norm_eps", 1e-12),
        dtype=dtype,
        pooler=pooler or VodPoolerConfig(),
    )


def _t(x: typ.Any) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def port_bert_weights(
    state_dict: typ.Mapping[str, typ.Any],
    cfg: TransformerEncoderConfig,
) -> dict:
    """torch BERT state_dict -> flax `TransformerEncoder` params subtree.

    Accepts both bare (`embeddings.*`) and prefixed (`bert.embeddings.*`) keys.
    """
    sd = dict(state_dict)
    if any(k.startswith("bert.") for k in sd):
        sd = {k[len("bert."):]: v for k, v in sd.items() if k.startswith("bert.")}

    def g(key: str) -> np.ndarray:
        return _t(sd[key])

    h = cfg.hidden_size
    n_heads = cfg.num_heads
    head = h // n_heads

    params: dict = {
        "embeddings": {
            "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
            "position_embeddings": {"embedding": g("embeddings.position_embeddings.weight")},
            "LayerNorm": {
                "scale": g("embeddings.LayerNorm.weight"),
                "bias": g("embeddings.LayerNorm.bias"),
            },
        }
    }
    if cfg.type_vocab_size:
        params["embeddings"]["token_type_embeddings"] = {
            "embedding": g("embeddings.token_type_embeddings.weight")
        }

    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        # torch Linear stores [out, in]; flax Dense kernels are [in, out].
        # flax MultiHeadDotProductAttention splits heads: [in, heads, head_dim].
        def lin(name: str) -> tuple[np.ndarray, np.ndarray]:
            return g(p + name + ".weight").T, g(p + name + ".bias")

        wq, bq = lin("attention.self.query")
        wk, bk = lin("attention.self.key")
        wv, bv = lin("attention.self.value")
        wo, bo = lin("attention.output.dense")
        wi, bi = lin("intermediate.dense")
        wo2, bo2 = lin("output.dense")
        params[f"layer_{i}"] = {
            "attention": {
                "query": {"kernel": wq.reshape(h, n_heads, head), "bias": bq.reshape(n_heads, head)},
                "key": {"kernel": wk.reshape(h, n_heads, head), "bias": bk.reshape(n_heads, head)},
                "value": {"kernel": wv.reshape(h, n_heads, head), "bias": bv.reshape(n_heads, head)},
                "out": {"kernel": wo.reshape(n_heads, head, h), "bias": bo},
            },
            "attention_norm": {
                "scale": g(p + "attention.output.LayerNorm.weight"),
                "bias": g(p + "attention.output.LayerNorm.bias"),
            },
            "intermediate": {"kernel": wi, "bias": bi},
            "output": {"kernel": wo2, "bias": bo2},
            "output_norm": {
                "scale": g(p + "output.LayerNorm.weight"),
                "bias": g(p + "output.LayerNorm.bias"),
            },
        }
    return params


def port_roberta_weights(
    state_dict: typ.Mapping[str, typ.Any],
    cfg: TransformerEncoderConfig,
    *,
    position_offset: int = 2,
) -> dict:
    """torch RoBERTa/XLM-R state_dict -> flax `TransformerEncoder` params.

    Parity: reference `VodRobertaEncoder`/`VodXLMRobertaEncoder`
    (`vod_encoder/modeling.py:285,297`). The layer layout is identical to
    BERT; the differences are (a) position embeddings start at
    `padding_idx + 1 = 2` (HF's `create_position_ids_from_input_ids`), folded
    in here by slicing the table so arange-positions line up, and (b)
    `type_vocab_size == 1` (a single token-type row, which the ported model
    keeps at index 0).
    """
    sd = dict(state_dict)
    for prefix in ("roberta.", "xlm_roberta."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            break
    pos = _t(sd["embeddings.position_embeddings.weight"])
    sd["embeddings.position_embeddings.weight"] = pos[position_offset:]
    return port_bert_weights(sd, cfg)


def load_hf_encoder(
    name_or_path: str,
    pooler: typ.Optional[VodPoolerConfig] = None,
    dtype=jnp.float32,
) -> tuple[TransformerEncoderConfig, dict]:
    """Load a hub/local BERT-family checkpoint and port it (requires HF cache
    offline). Dispatches BERT vs RoBERTa/XLM-R layouts by `model_type`."""
    import transformers

    hf = transformers.AutoModel.from_pretrained(name_or_path)
    if getattr(hf.config, "model_type", "bert") in ("roberta", "xlm-roberta", "camembert"):
        cfg = config_from_hf(hf.config, pooler=pooler, dtype=dtype, position_offset=2)
        params = port_roberta_weights(hf.state_dict(), cfg)
    else:
        cfg = config_from_hf(hf.config, pooler=pooler, dtype=dtype)
        params = port_bert_weights(hf.state_dict(), cfg)
    return cfg, params
