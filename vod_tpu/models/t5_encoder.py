"""T5-style encoder (pre-LN, relative position bias, bias-free dense).

Parity: reference `VodT5Encoder` (`vod_encoder/modeling.py:273`) wraps HF
`T5EncoderModel`; here the native flax implementation matches the T5 tensor
layout so `port_t5_encoder_weights` maps hub checkpoints (t5-small,
sentence-t5, ...) directly.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from .pooler import VodPooler, VodPoolerConfig


@struct.dataclass
class T5EncoderConfig:
    vocab_size: int = 32128
    hidden_size: int = 512
    num_layers: int = 6
    num_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 2048
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dtype: typ.Any = jnp.bfloat16
    pooler: VodPoolerConfig = struct.field(default_factory=VodPoolerConfig)


class _RMSNorm(nn.Module):
    """T5 LayerNorm: RMS-only, no mean subtraction, no bias."""

    eps: float = 1e-6
    dtype: typ.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(self.dtype) * scale.astype(self.dtype)


def _relative_buckets(rel_pos: jax.Array, num_buckets: int, max_distance: int) -> jax.Array:
    """T5's bidirectional relative-position bucketing."""
    num_buckets //= 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class _T5Attention(nn.Module):
    cfg: T5EncoderConfig
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, rel_bias: typ.Optional[jax.Array]) -> tuple[jax.Array, typ.Optional[jax.Array]]:
        cfg = self.cfg
        inner = cfg.num_heads * cfg.head_dim
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name=name)
        l = x.shape[-2]
        q = dense("q")(x).reshape(*x.shape[:-1], cfg.num_heads, cfg.head_dim)
        k = dense("k")(x).reshape(*x.shape[:-1], cfg.num_heads, cfg.head_dim)
        v = dense("v")(x).reshape(*x.shape[:-1], cfg.num_heads, cfg.head_dim)
        # T5 does NOT scale by sqrt(d)
        scores = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32)
        if self.has_rel_bias:
            pos = jnp.arange(l)
            rel = pos[None, :] - pos[:, None]  # memory - query
            buckets = _relative_buckets(
                rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
            )
            table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, cfg.num_heads),
            )
            rel_bias = jnp.transpose(table[buckets], (2, 0, 1))[None]  # [1, H, L, L]
        if rel_bias is not None:
            scores = scores + rel_bias.astype(scores.dtype)
        scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", probs, v).reshape(*x.shape[:-1], inner)
        out = nn.Dense(x.shape[-1], use_bias=False, dtype=cfg.dtype, name="o")(out)
        return out, rel_bias


class _T5Block(nn.Module):
    cfg: T5EncoderConfig
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, rel_bias):
        cfg = self.cfg
        h = _RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype, name="ln0")(x)
        attn, rel_bias = _T5Attention(cfg, self.has_rel_bias, name="attention")(h, mask, rel_bias)
        x = x + attn
        h = _RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype, name="ln1")(x)
        ff = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=cfg.dtype, name="wi")(h)
        ff = nn.relu(ff)
        ff = nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype, name="wo")(ff)
        return x + ff, rel_bias


class T5Encoder(nn.Module):
    cfg: T5EncoderConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="shared", dtype=cfg.dtype)(input_ids)
        rel_bias = None
        for i in range(cfg.num_layers):
            h, rel_bias = _T5Block(cfg, has_rel_bias=(i == 0), name=f"block_{i}")(
                h, attention_mask, rel_bias
            )
        h = _RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype, name="final_norm")(h)
        return h


class VodT5Encoder(nn.Module):
    """T5 encoder + VodPooler (parity: `VodT5Encoder`, `modeling.py:273`)."""

    cfg: T5EncoderConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        h = T5Encoder(self.cfg, name="backbone")(input_ids, attention_mask)
        return VodPooler(self.cfg.pooler, self.cfg.hidden_size, name="vod_pooler")(
            h.astype(jnp.float32), attention_mask
        )


def t5_config_from_hf(hf_config: typ.Any, pooler: typ.Optional[VodPoolerConfig] = None, dtype=jnp.float32) -> T5EncoderConfig:
    return T5EncoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.d_model,
        num_layers=hf_config.num_layers,
        num_heads=hf_config.num_heads,
        head_dim=hf_config.d_kv,
        intermediate_size=hf_config.d_ff,
        relative_attention_num_buckets=hf_config.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(hf_config, "relative_attention_max_distance", 128),
        dtype=dtype,
        pooler=pooler or VodPoolerConfig(),
    )


def port_t5_encoder_weights(state_dict: typ.Mapping[str, typ.Any], cfg: T5EncoderConfig) -> dict:
    """torch T5 (encoder) state_dict -> flax `T5Encoder` params subtree."""

    def g(key: str) -> np.ndarray:
        v = state_dict[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    prefix = "encoder." if any(k.startswith("encoder.") for k in state_dict) else ""
    params: dict = {
        "shared": {"embedding": g("shared.weight") if "shared.weight" in state_dict else g(prefix + "embed_tokens.weight")},
        "final_norm": {"weight": g(prefix + "final_layer_norm.weight")},
    }
    for i in range(cfg.num_layers):
        p = f"{prefix}block.{i}."
        blk = {
            "ln0": {"weight": g(p + "layer.0.layer_norm.weight")},
            "attention": {
                "q": {"kernel": g(p + "layer.0.SelfAttention.q.weight").T},
                "k": {"kernel": g(p + "layer.0.SelfAttention.k.weight").T},
                "v": {"kernel": g(p + "layer.0.SelfAttention.v.weight").T},
                "o": {"kernel": g(p + "layer.0.SelfAttention.o.weight").T},
            },
            "ln1": {"weight": g(p + "layer.1.layer_norm.weight")},
            "wi": {"kernel": g(p + "layer.1.DenseReluDense.wi.weight").T},
            "wo": {"kernel": g(p + "layer.1.DenseReluDense.wo.weight").T},
        }
        if i == 0:
            blk["attention"]["relative_attention_bias"] = g(
                p + "layer.0.SelfAttention.relative_attention_bias.weight"
            )
        params[f"block_{i}"] = blk
    return params
