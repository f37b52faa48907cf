"""T5-style seq2seq reader: encoder-decoder LM for Realm systems.

Parity: the reference wires any HF seq2seq LM as the REALM reader (hydra group
`model/lm/`; BASELINE config #5: "e5 retriever + T5 reader"). The decoder follows
the T5 layout (RMSNorm pre-LN, relative-position self-attention bias on layer 0,
cross-attention, bias-free dense, relu FFN) on top of `t5_encoder.T5Encoder`.

Realm integration (`Seq2SeqRealm`): the [context; question] tokens feed the
encoder; the answer tokens feed the decoder teacher-forced with a BOS shift.
The gradient estimators' `_lm_logprobs` contract (next-token logprobs over
`lm__input_ids`) is preserved by handing them the BOS-prefixed answer sequence
and the decoder logits over the same positions.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from vod_tpu.types.batch import RealmBatch, RealmOutput
from .encoder import DebugEncoder, TransformerEncoderConfig, VodEncoder
from .gradients import Gradients
from .systems import _fused_encode
from .t5_encoder import T5Encoder, T5EncoderConfig, _RMSNorm


class _T5CrossAttention(nn.Module):
    cfg: T5EncoderConfig

    @nn.compact
    def __call__(self, x: jax.Array, mem: jax.Array, mem_mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        inner = cfg.num_heads * cfg.head_dim
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name=name)
        q = dense("q")(x).reshape(*x.shape[:-1], cfg.num_heads, cfg.head_dim)
        k = dense("k")(mem).reshape(*mem.shape[:-1], cfg.num_heads, cfg.head_dim)
        v = dense("v")(mem).reshape(*mem.shape[:-1], cfg.num_heads, cfg.head_dim)
        scores = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32)
        scores = jnp.where(mem_mask[:, None, None, :] > 0, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", probs, v).reshape(*x.shape[:-1], inner)
        return nn.Dense(x.shape[-1], use_bias=False, dtype=cfg.dtype, name="o")(out)


class _T5DecoderBlock(nn.Module):
    cfg: T5EncoderConfig
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x, self_mask, mem, mem_mask, rel_bias):
        cfg = self.cfg
        h = _RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype, name="ln0")(x)
        attn, rel_bias = self._self_attn(h, self_mask, rel_bias)
        x = x + attn
        h = _RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype, name="ln1")(x)
        x = x + _T5CrossAttention(cfg, name="cross_attention")(h, mem, mem_mask)
        h = _RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype, name="ln2")(x)
        ff = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=cfg.dtype, name="wi")(h)
        ff = nn.relu(ff)
        ff = nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype, name="wo")(ff)
        return x + ff, rel_bias

    def _self_attn(self, h, self_mask, rel_bias):
        """Causal self-attention with T5 relative bias (mask includes causality)."""
        cfg = self.cfg
        inner = cfg.num_heads * cfg.head_dim
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name=f"self_{name}")
        l = h.shape[-2]
        q = dense("q")(h).reshape(*h.shape[:-1], cfg.num_heads, cfg.head_dim)
        k = dense("k")(h).reshape(*h.shape[:-1], cfg.num_heads, cfg.head_dim)
        v = dense("v")(h).reshape(*h.shape[:-1], cfg.num_heads, cfg.head_dim)
        scores = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32)
        if self.has_rel_bias:
            from .t5_encoder import _relative_buckets

            pos = jnp.arange(l)
            rel = pos[None, :] - pos[:, None]
            buckets = _relative_buckets(
                rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
            )
            table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, cfg.num_heads),
            )
            rel_bias = jnp.transpose(table[buckets], (2, 0, 1))[None]
        if rel_bias is not None:
            scores = scores + rel_bias.astype(scores.dtype)
        scores = jnp.where(self_mask, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", probs, v).reshape(*h.shape[:-1], inner)
        return nn.Dense(h.shape[-1], use_bias=False, dtype=cfg.dtype, name="self_o")(out), rel_bias


class Seq2SeqLM(nn.Module):
    """T5-style encoder-decoder; returns decoder next-token logits [B, Ld, V]."""

    cfg: T5EncoderConfig

    @nn.compact
    def __call__(
        self,
        enc_ids: jax.Array,
        enc_mask: jax.Array,
        dec_ids: jax.Array,
        dec_mask: jax.Array,
    ) -> jax.Array:
        cfg = self.cfg
        mem = T5Encoder(cfg, name="encoder")(enc_ids, enc_mask)
        h = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="dec_embed", dtype=cfg.dtype)(dec_ids)
        ld = dec_ids.shape[-1]
        causal = jnp.tril(jnp.ones((ld, ld), dtype=bool))[None, None]
        pad = (dec_mask[:, None, None, :] > 0)
        self_mask = causal & pad
        rel_bias = None
        for i in range(cfg.num_layers):
            h, rel_bias = _T5DecoderBlock(cfg, has_rel_bias=(i == 0), name=f"block_{i}")(
                h, self_mask, mem, enc_mask, rel_bias
            )
        h = _RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype, name="final_norm")(h)
        return nn.Dense(cfg.vocab_size, use_bias=False, dtype=jnp.float32, name="lm_head")(
            h.astype(jnp.float32)
        )


class Seq2SeqRealm(nn.Module):
    """Dual-encoder retriever + T5 seq2seq reader (BASELINE config #5)."""

    cfg: TransformerEncoderConfig  # retriever encoder
    reader_cfg: T5EncoderConfig
    gradients: Gradients
    debug_encoder: bool = False

    def setup(self) -> None:
        enc_cls = DebugEncoder if self.debug_encoder else VodEncoder
        self.encoder = enc_cls(self.cfg, name="encoder")
        self.reader = Seq2SeqLM(self.reader_cfg, name="reader")

    def encode(self, batch: RealmBatch) -> dict[str, jax.Array]:
        return _fused_encode(self.encoder, batch)

    def encode_field(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        return self.encoder(input_ids, attention_mask)

    def _reader_io(self, batch: RealmBatch) -> tuple[jax.Array, jax.Array, jax.Array]:
        """(lm_logits, bos_answer_ids, bos_answer_mask), flattened to [B*D, ...].

        Encoder side = the collate's [context; question] segments
        (token_type_ids < 2); decoder side = BOS-shifted answer tokens
        (token_type_ids == 2).
        """
        ids = batch.lm__input_ids
        tt = batch.lm__token_type_ids
        mask = batch.lm__attention_mask
        b, d_, l = ids.shape
        flat = lambda x: x.reshape(b * d_, l)
        ids_f, tt_f, mask_f = flat(ids), flat(tt), flat(mask)
        enc_mask = ((tt_f < 2) & (mask_f > 0)).astype(jnp.int32)
        ans_mask = ((tt_f == 2) & (mask_f > 0)).astype(jnp.int32)
        # compact the (right-aligned-ish) answer segment to the front via sort:
        # stable argsort on (not-answer) keeps answer tokens in order at the front
        order = jnp.argsort(1 - ans_mask, axis=-1, stable=True)
        ans_ids = jnp.take_along_axis(ids_f * ans_mask, order, axis=-1)
        ans_m = jnp.take_along_axis(ans_mask, order, axis=-1)
        la = min(l, 64)
        ans_ids, ans_m = ans_ids[:, :la], ans_m[:, :la]
        # teacher forcing: decoder consumes [BOS, a1..a_{la-1}]
        bos = jnp.zeros((b * d_, 1), dtype=ids_f.dtype)
        dec_in = jnp.concatenate([bos, ans_ids[:, :-1]], axis=-1)
        dec_m = jnp.concatenate([jnp.ones((b * d_, 1), jnp.int32), ans_m[:, :-1]], axis=-1)
        logits = self.reader(ids_f * enc_mask, enc_mask, dec_in, dec_m)
        # estimator contract (`_lm_logprobs` shifts internally): with
        # ids = dec_in = [BOS, a1..a_{la-1}], targets ids[1:] = a1.. align with
        # logits[:-1] — exactly the decoder's teacher-forced predictions.
        return logits, dec_in, dec_m

    def evaluate(self, batch: RealmBatch) -> RealmOutput:
        enc = self.encode(batch)
        logits, lm_ids, lm_mask = self._reader_io(batch)
        b = batch.query__input_ids.shape[0]
        d_ = batch.section__score.shape[-1]
        patched = batch.replace(
            lm__input_ids=lm_ids.reshape(b, d_, -1),
            lm__attention_mask=lm_mask.reshape(b, d_, -1),
        )
        return self.gradients(batch=patched, lm_logits=logits, **enc)

    def __call__(self, batch: RealmBatch, mode: str = "evaluate") -> typ.Any:
        if mode == "encode":
            return self.encode(batch)
        if mode == "evaluate":
            return self.evaluate(batch)
        raise ValueError(f"Unknown mode: {mode}")
