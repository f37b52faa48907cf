"""Causal language model (the REALM "reader").

Parity: the reference wires any HF autoregressive LM into `Realm`
(`vod_systems/realm.py:20`, hydra group `model/lm/`); the reader consumes
flattened `[B*D, L]` token tensors and returns logits (`realm.py:56-62`).
This is a native flax GPT-style decoder (pre-LN, causal mask, learned positions),
sized by config; HF checkpoints can be ported tensor-by-tensor later.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct


@struct.dataclass
class CausalLMConfig:
    vocab_size: int = 30522
    hidden_size: int = 256
    num_layers: int = 4
    num_heads: int = 4
    intermediate_size: int = 1024
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5
    dtype: typ.Any = jnp.bfloat16


class _DecoderLayer(nn.Module):
    cfg: CausalLMConfig

    @nn.compact
    def __call__(self, h: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln1", dtype=cfg.dtype)(h)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, qkv_features=cfg.hidden_size, dtype=cfg.dtype, name="attention"
        )(x, x, mask=mask)
        h = h + attn
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln2", dtype=cfg.dtype)(h)
        ff = nn.Dense(cfg.intermediate_size, name="fc_in", dtype=cfg.dtype)(x)
        ff = nn.gelu(ff)
        ff = nn.Dense(cfg.hidden_size, name="fc_out", dtype=cfg.dtype)(ff)
        return h + ff


class CausalLM(nn.Module):
    cfg: CausalLMConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        """Returns next-token logits [B, L, V] (float32)."""
        cfg = self.cfg
        l = input_ids.shape[-1]
        h = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="wte", dtype=cfg.dtype)(input_ids)
        pos = jnp.arange(l)[None]
        h = h + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, name="wpe", dtype=cfg.dtype)(pos)
        causal = nn.make_causal_mask(input_ids, dtype=jnp.bool_)  # [B, 1, L, L]
        pad = (attention_mask[:, None, None, :] > 0)
        mask = causal & pad
        for i in range(cfg.num_layers):
            h = _DecoderLayer(cfg, name=f"layer_{i}")(h, mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln_f", dtype=cfg.dtype)(h)
        logits = nn.Dense(cfg.vocab_size, name="lm_head", use_bias=False, dtype=jnp.float32)(
            h.astype(jnp.float32)
        )
        return logits
