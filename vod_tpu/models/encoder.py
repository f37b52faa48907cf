"""Transformer encoder in flax, with VOD pooling.

Parity: reference `src/vod_models/vod_encoder/modeling.py` wraps HF BERT / T5 /
RoBERTa / XLM-R encoders (`modeling.py:261-307`) plus embedding-only `*Debug`
variants (`:309-366`). Here the backbone is a native flax BERT-style encoder
(bias-full post-LN transformer, BERT weight layout) so HF bert-family checkpoints
(e5-small etc.) can be ported tensor-by-tensor; `DebugEncoder` is the
embedding-only debug variant.

TPU notes: computations default to bfloat16 activations with fp32 params
(`dtype` vs `param_dtype`), sequence lengths are static, masks are multiplicative
additive-(-inf) biases — everything jits to one fused program.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from .pooler import VodPooler, VodPoolerConfig


@struct.dataclass
class TransformerEncoderConfig:
    vocab_size: int = 30522
    hidden_size: int = 256
    num_layers: int = 4
    num_heads: int = 4
    intermediate_size: int = 1024
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: typ.Any = jnp.bfloat16
    remat: bool = False  # jax.checkpoint each layer (TweaksConfig.remat parity:
    #                      the reference's gradient-checkpointing tweak, `support.py:23`)
    lora_rank: int = 0  # >0: LoRA adapters on attention/FFN Dense kernels
    #                     (TweaksConfig peft/LoRA parity)
    lora_alpha: float = 16.0
    moe_experts: int = 0  # >0: replace each FFN with a top-k routed MoE
    #                       (expert weights shard over an `ep` mesh axis via
    #                       `parallel.ep_sharding`; beyond reference — no MoE
    #                       exists upstream). Pre-scaled Switch aux losses are
    #                       sowed into the "losses" collection; the train step
    #                       picks them up via `mutable=["losses"]`.
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 1e-2
    pooler: VodPoolerConfig = struct.field(default_factory=VodPoolerConfig)


class _Embeddings(nn.Module):
    cfg: TransformerEncoderConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, token_type_ids: typ.Optional[jax.Array]) -> jax.Array:
        cfg = self.cfg
        h = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings", dtype=cfg.dtype)(input_ids)
        pos = jnp.arange(input_ids.shape[-1])[None]
        h = h + nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embeddings", dtype=cfg.dtype
        )(pos)
        if cfg.type_vocab_size:
            tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
            h = h + nn.Embed(cfg.type_vocab_size, cfg.hidden_size, name="token_type_embeddings", dtype=cfg.dtype)(tt)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="LayerNorm", dtype=cfg.dtype)(h)
        return h


class LoraDense(nn.Module):
    """Dense + low-rank adapter: `x W + (alpha/r) (x A) B` (LoRA).

    The base kernel trains as usual unless frozen via `lora_trainable_mask`
    (parity: the reference's peft/LoRA tweak, `vod_models/support.py:23`).
    """

    features: int
    rank: int
    alpha: float = 16.0
    dtype: typ.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Dense(self.features, dtype=self.dtype, name="base")(x)
        a = self.param("lora_a", nn.initializers.normal(0.02), (x.shape[-1], self.rank))
        b = self.param("lora_b", nn.initializers.zeros, (self.rank, self.features))
        scale = self.alpha / self.rank
        return y + scale * ((x @ a.astype(x.dtype)) @ b.astype(x.dtype))


def lora_trainable_mask(params: typ.Any) -> typ.Any:
    """Pytree mask: True for LoRA adapters + pooler params (use with
    `optax.masked` to freeze the base weights)."""
    import jax as _jax

    def rule(path, leaf):
        key = _jax.tree_util.keystr(path)
        return ("lora_a" in key) or ("lora_b" in key) or ("vod_pooler" in key)

    return _jax.tree_util.tree_map_with_path(rule, params)


class _Layer(nn.Module):
    cfg: TransformerEncoderConfig

    @nn.compact
    def __call__(self, h: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads,
            qkv_features=cfg.hidden_size,
            dtype=cfg.dtype,
            name="attention",
        )(h, h, mask=mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attention_norm", dtype=cfg.dtype)(h + attn_out)
        if cfg.moe_experts > 0:
            if cfg.lora_rank > 0:
                raise ValueError(
                    "moe_experts and lora_rank are mutually exclusive: the MoE "
                    "FFN replaces the Dense kernels LoRA would adapt"
                )
            from vod_tpu.parallel.moe import MoEFFN

            ff, aux = MoEFFN(
                n_experts=cfg.moe_experts,
                intermediate_size=cfg.intermediate_size,
                top_k=cfg.moe_top_k,
                capacity_factor=cfg.moe_capacity_factor,
                dtype=cfg.dtype,
                name="moe",
            )(h)
            if not self.is_initializing():
                # pre-scaled so the train step can add a plain sum; skipped at
                # init so `model.init` returns only the params collection
                self.sow("losses", "moe_aux", cfg.moe_aux_weight * aux)
        elif cfg.lora_rank > 0:
            ff = LoraDense(cfg.intermediate_size, cfg.lora_rank, cfg.lora_alpha, dtype=cfg.dtype, name="intermediate")(h)
            ff = nn.gelu(ff)
            ff = LoraDense(cfg.hidden_size, cfg.lora_rank, cfg.lora_alpha, dtype=cfg.dtype, name="output")(ff)
        else:
            ff = nn.Dense(cfg.intermediate_size, name="intermediate", dtype=cfg.dtype)(h)
            ff = nn.gelu(ff)
            ff = nn.Dense(cfg.hidden_size, name="output", dtype=cfg.dtype)(ff)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="output_norm", dtype=cfg.dtype)(h + ff)
        return h


class TransformerEncoder(nn.Module):
    """BERT-style post-LN encoder backbone."""

    cfg: TransformerEncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        token_type_ids: typ.Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        h = _Embeddings(cfg, name="embeddings")(input_ids, token_type_ids)
        # boolean attention mask broadcast to [B, 1, 1(=Lq), L]
        mask = (attention_mask[:, None, None, :] > 0)
        layer_cls = nn.remat(_Layer) if cfg.remat else _Layer
        for i in range(cfg.num_layers):
            h = layer_cls(cfg, name=f"layer_{i}")(h, mask)
        return h


class VodEncoder(nn.Module):
    """Backbone + VodPooler (parity: `VodEncoderBase`, `modeling.py:186-258`)."""

    cfg: TransformerEncoderConfig

    def setup(self) -> None:
        self.backbone = TransformerEncoder(self.cfg, name="backbone")
        self.vod_pooler = VodPooler(self.cfg.pooler, self.cfg.hidden_size, name="vod_pooler")

    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        h = self.backbone(input_ids, attention_mask)
        return self.vod_pooler(h.astype(jnp.float32), attention_mask)

    def tokens(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        """Per-token L2-normalized embeddings `[B, T, H]` — the multi-vector
        representation for late-interaction (MaxSim) indexing; padding tokens
        zeroed (they can then never win a max against a real token)."""
        h = self.backbone(input_ids, attention_mask).astype(jnp.float32)
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
        return h * (attention_mask[..., None] > 0)


class DebugEncoder(nn.Module):
    """Embedding-only encoder (parity: `*Debug` variants, `modeling.py:309-366`):
    word embeddings + pooling, no attention — for fast pipeline debugging."""

    cfg: TransformerEncoderConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        h = nn.Embed(self.cfg.vocab_size, self.cfg.hidden_size, name="word_embeddings")(input_ids)
        pooled = VodPooler(self.cfg.pooler, self.cfg.hidden_size, name="vod_pooler")(
            h.astype(jnp.float32), attention_mask
        )
        return pooled
