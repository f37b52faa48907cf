"""T5-style seq2seq reader: encoder-decoder LM for Realm systems.

Parity: the reference wires any HF seq2seq LM as the REALM reader (hydra group
`model/lm/`; BASELINE config #5: "e5 retriever + T5 reader"). The decoder follows
the T5 layout (RMSNorm pre-LN, relative-position self-attention bias on layer 0,
cross-attention, bias-free dense, relu FFN) on top of `t5_encoder.T5Encoder`, and
`port_t5_seq2seq_weights` maps a HF `T5ForConditionalGeneration` state_dict in
losslessly (reference `vod_models/vod_models.py` wraps the HF module directly).

Realm integration (`Seq2SeqRealm`): the [context; question] tokens feed the
encoder; the answer tokens feed the decoder teacher-forced with a BOS shift.
The gradient estimators' `_lm_logprobs` contract (next-token logprobs over
`lm__input_ids`) is preserved by handing them the BOS-prefixed answer sequence
and the decoder logits over the same positions.

Generation (`generate` / mode="generate") is tpu-native incremental decoding:
the encoder runs once, cross-attention K/V are precomputed per layer, and a
`lax.scan` carries per-layer self-attention K/V caches — each step is one
[B, 1] decoder pass (no quadratic recompute), everything under a single jit
with static shapes.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vod_tpu.types.batch import RealmBatch, RealmOutput
from .encoder import DebugEncoder, TransformerEncoderConfig, VodEncoder
from .gradients import Gradients
from .systems import _fused_encode
from .t5_encoder import T5Encoder, T5EncoderConfig, _RMSNorm, port_t5_encoder_weights


def compact_answer_segment(
    ids: jax.Array, tt: jax.Array, mask: jax.Array, max_len: int
) -> tuple[jax.Array, jax.Array]:
    """Front-compact the answer segment (`token_type_ids == 2`) of lm inputs.

    Shape-agnostic over leading dims; returns (answer_ids, answer_mask)
    truncated to `max_len`. A stable argsort on (not-answer) moves answer
    tokens to the front while preserving their order. Shared by the
    teacher-forced reader io and the generation metrics so gold answers are
    always the segment the decoder was trained on.
    """
    ans_mask = ((tt == 2) & (mask > 0)).astype(jnp.int32)
    order = jnp.argsort(1 - ans_mask, axis=-1, stable=True)
    ans_ids = jnp.take_along_axis(ids * ans_mask, order, axis=-1)
    ans_m = jnp.take_along_axis(ans_mask, order, axis=-1)
    return ans_ids[..., :max_len], ans_m[..., :max_len]


def _relative_buckets_causal(rel_pos: jax.Array, num_buckets: int, max_distance: int) -> jax.Array:
    """T5's *unidirectional* bucketing (decoder self-attention).

    HF uses `bidirectional=not is_decoder`: the decoder keeps all `num_buckets`
    for non-positive relative positions (memory_pos - query_pos <= 0). Future
    positions (rel > 0) map to bucket 0 — they are causally masked anyway.
    """
    n = -jnp.minimum(rel_pos, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return jnp.where(is_small, n, val_large)


class _T5CrossAttention(nn.Module):
    cfg: T5EncoderConfig

    def setup(self) -> None:
        cfg = self.cfg
        inner = cfg.num_heads * cfg.head_dim
        mk = lambda dim: nn.Dense(dim, use_bias=False, dtype=cfg.dtype)
        self.q, self.k, self.v = mk(inner), mk(inner), mk(inner)
        self.o = mk(cfg.hidden_size)

    def kv(self, mem: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Precompute cross K/V from encoder memory (once per generation)."""
        cfg = self.cfg
        shape = (*mem.shape[:-1], cfg.num_heads, cfg.head_dim)
        return self.k(mem).reshape(shape), self.v(mem).reshape(shape)

    def __call__(self, x: jax.Array, mem_mask: jax.Array, kv: tuple[jax.Array, jax.Array]) -> jax.Array:
        cfg = self.cfg
        k, v = kv
        q = self.q(x).reshape(*x.shape[:-1], cfg.num_heads, cfg.head_dim)
        scores = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32)
        scores = jnp.where(mem_mask[:, None, None, :] > 0, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", probs, v)
        return self.o(out.reshape(*x.shape[:-1], cfg.num_heads * cfg.head_dim))


class _T5DecoderBlock(nn.Module):
    cfg: T5EncoderConfig
    has_rel_bias: bool = False

    def setup(self) -> None:
        cfg = self.cfg
        inner = cfg.num_heads * cfg.head_dim
        mk = lambda dim: nn.Dense(dim, use_bias=False, dtype=cfg.dtype)
        self.ln0 = _RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype)
        self.ln1 = _RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype)
        self.ln2 = _RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype)
        self.self_q, self.self_k, self.self_v = mk(inner), mk(inner), mk(inner)
        self.self_o = mk(cfg.hidden_size)
        self.cross_attention = _T5CrossAttention(cfg)
        self.wi = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=cfg.dtype)
        self.wo = nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype)
        if self.has_rel_bias:
            self.relative_attention_bias = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (self.cfg.relative_attention_num_buckets, self.cfg.num_heads),
            )

    def _heads(self, proj: nn.Dense, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        return proj(x).reshape(*x.shape[:-1], cfg.num_heads, cfg.head_dim)

    def _rel_bias_full(self, l: int) -> jax.Array:
        """[1, H, L, L] causal-bucketed bias from this block's table."""
        pos = jnp.arange(l)
        rel = pos[None, :] - pos[:, None]  # memory - query
        buckets = _relative_buckets_causal(
            rel, self.cfg.relative_attention_num_buckets, self.cfg.relative_attention_max_distance
        )
        return jnp.transpose(jnp.take(jnp.asarray(self.relative_attention_bias), buckets, axis=0), (2, 0, 1))[None]

    def _rel_bias_step(self, pos: jax.Array, l_max: int) -> jax.Array:
        """[1, H, 1, Lmax] bias for a single query at position `pos`."""
        rel = jnp.arange(l_max) - pos  # memory - query
        buckets = _relative_buckets_causal(
            rel, self.cfg.relative_attention_num_buckets, self.cfg.relative_attention_max_distance
        )
        return jnp.transpose(jnp.take(jnp.asarray(self.relative_attention_bias), buckets, axis=0), (1, 0))[None, :, None, :]

    def _finish_attn(self, q, k, v, scores_bias, key_mask) -> jax.Array:
        scores = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32)
        if scores_bias is not None:
            scores = scores + scores_bias.astype(scores.dtype)
        scores = jnp.where(key_mask, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.cfg.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", probs, v)
        return self.self_o(out.reshape(*out.shape[:-2], -1))

    def __call__(self, x, self_mask, mem_mask, cross_kv, rel_bias):
        """Teacher-forced full-sequence pass. `self_mask` includes causality."""
        h = self.ln0(x)
        if self.has_rel_bias:
            rel_bias = self._rel_bias_full(x.shape[-2])
        q, k, v = (self._heads(p, h) for p in (self.self_q, self.self_k, self.self_v))
        x = x + self._finish_attn(q, k, v, rel_bias, self_mask)
        h = self.ln1(x)
        x = x + self.cross_attention(h, mem_mask, cross_kv)
        h = self.ln2(x)
        return x + self.wo(nn.relu(self.wi(h))), rel_bias

    def step(self, x, pos, mem_mask, cross_kv, cache_k, cache_v, rel_bias):
        """One-token decode: x [B, 1, H*Dh-input]; caches [B, Lmax, H, Dh].

        Returns (x, new_cache_k, new_cache_v, rel_bias) — K/V at `pos` written
        via dynamic_update_slice so the whole step stays shape-static under jit.
        """
        l_max = cache_k.shape[1]
        h = self.ln0(x)
        if self.has_rel_bias:
            rel_bias = self._rel_bias_step(pos, l_max)
        q = self._heads(self.self_q, h)
        k_new = self._heads(self.self_k, h)
        v_new = self._heads(self.self_v, h)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k_new.astype(cache_k.dtype), pos, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v_new.astype(cache_v.dtype), pos, axis=1)
        key_mask = (jnp.arange(l_max) <= pos)[None, None, None, :]
        x = x + self._finish_attn(q, cache_k, cache_v, rel_bias, key_mask)
        h = self.ln1(x)
        x = x + self.cross_attention(h, mem_mask, cross_kv)
        h = self.ln2(x)
        return x + self.wo(nn.relu(self.wi(h))), cache_k, cache_v, rel_bias


class Seq2SeqLM(nn.Module):
    """T5-style encoder-decoder; returns decoder next-token logits [B, Ld, V]."""

    cfg: T5EncoderConfig

    def setup(self) -> None:
        cfg = self.cfg
        self.encoder = T5Encoder(cfg)
        self.dec_embed = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype)
        self.block = [
            _T5DecoderBlock(cfg, has_rel_bias=(i == 0)) for i in range(cfg.num_layers)
        ]
        self.final_norm = _RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype)
        self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False, dtype=jnp.float32)

    def encode(self, enc_ids: jax.Array, enc_mask: jax.Array) -> jax.Array:
        return self.encoder(enc_ids, enc_mask)

    def __call__(
        self,
        enc_ids: jax.Array,
        enc_mask: jax.Array,
        dec_ids: jax.Array,
        dec_mask: jax.Array,
    ) -> jax.Array:
        mem = self.encode(enc_ids, enc_mask)
        h = self.dec_embed(dec_ids)
        ld = dec_ids.shape[-1]
        causal = jnp.tril(jnp.ones((ld, ld), dtype=bool))[None, None]
        self_mask = causal & (dec_mask[:, None, None, :] > 0)
        rel_bias = None
        for blk in self.block:
            cross_kv = blk.cross_attention.kv(mem)
            h, rel_bias = blk(h, self_mask, enc_mask, cross_kv, rel_bias)
        h = self.final_norm(h)
        return self.lm_head(h.astype(jnp.float32))

    # ---- incremental decoding -------------------------------------------

    def init_cache(self, mem: jax.Array, max_len: int) -> dict:
        """Per-layer self-attn K/V caches + precomputed cross K/V."""
        cfg = self.cfg
        b = mem.shape[0]
        zeros = lambda: jnp.zeros((b, max_len, cfg.num_heads, cfg.head_dim), dtype=cfg.dtype)
        return {
            f"layer_{i}": {
                "k": zeros(),
                "v": zeros(),
                "cross_kv": blk.cross_attention.kv(mem),
            }
            for i, blk in enumerate(self.block)
        }

    def decode_step(
        self, tok: jax.Array, pos: jax.Array, mem_mask: jax.Array, cache: dict
    ) -> tuple[jax.Array, dict]:
        """One decode step: tok [B] int32 at position `pos` -> (logits [B, V], cache)."""
        h = self.dec_embed(tok[:, None])  # [B, 1, H]
        rel_bias = None
        new_cache = {}
        for i, blk in enumerate(self.block):
            c = cache[f"layer_{i}"]
            h, ck, cv, rel_bias = blk.step(h, pos, mem_mask, c["cross_kv"], c["k"], c["v"], rel_bias)
            new_cache[f"layer_{i}"] = {"k": ck, "v": cv, "cross_kv": c["cross_kv"]}
        h = self.final_norm(h)
        return self.lm_head(h.astype(jnp.float32))[:, 0, :], new_cache


def filter_logits(
    logits: jax.Array,
    top_k: typ.Optional[int] = None,
    top_p: typ.Optional[float] = None,
) -> jax.Array:
    """Top-k / nucleus (top-p) logit filtering for sampled decoding.

    Parity: the reference delegates generation to HF `generate` (mode dispatch
    `vod_systems/base.py:37-51`), whose samplers apply the same two filters.
    Static-shape implementation: top-k via the k-th-largest threshold, top-p via
    a descending sort + cumulative softmax mass; masked logits become -inf.
    """
    if top_k is not None and top_k > 0 and top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and 0.0 < top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens while the mass BEFORE them is < top_p (always >= 1 token)
        keep_sorted = jnp.concatenate(
            [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < top_p], axis=-1
        )
        # threshold = smallest kept logit per row
        thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < thresh, -jnp.inf, logits)
    return logits


def generate(
    model: Seq2SeqLM,
    params: typ.Mapping,
    enc_ids: jax.Array,
    enc_mask: jax.Array,
    *,
    max_new_tokens: int = 32,
    bos_id: int = 0,
    eos_id: int = 1,
    temperature: float = 0.0,
    top_k: typ.Optional[int] = None,
    top_p: typ.Optional[float] = None,
    rng: typ.Optional[jax.Array] = None,
) -> jax.Array:
    """KV-cached autoregressive generation (greedy, or sampled if temperature>0,
    with optional top-k / nucleus filtering).

    Encoder runs once; each of the `max_new_tokens` scan steps is a single
    [B, 1] decoder pass against the running cache. Finished rows (emitted
    `eos_id`) keep emitting `bos_id` (T5's pad). Returns [B, max_new_tokens].
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    mem = model.apply(params, enc_ids, enc_mask, method=Seq2SeqLM.encode)
    cache = model.apply(params, mem, max_new_tokens, method=Seq2SeqLM.init_cache)

    def step(carry, key):
        tok, pos, cache, finished = carry
        logits, cache = model.apply(
            params, tok, pos, enc_mask, cache, method=Seq2SeqLM.decode_step
        )
        if temperature > 0.0:
            nxt = jax.random.categorical(
                key, filter_logits(logits / temperature, top_k, top_p), axis=-1
            )
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, jnp.full_like(nxt, bos_id), nxt).astype(jnp.int32)
        finished = finished | (nxt == eos_id)
        return (nxt, pos + 1, cache, finished), nxt

    b = enc_ids.shape[0]
    init = (
        jnp.full((b,), bos_id, dtype=jnp.int32),
        jnp.asarray(0, dtype=jnp.int32),
        cache,
        jnp.zeros((b,), dtype=bool),
    )
    _, toks = jax.lax.scan(step, init, jax.random.split(rng, max_new_tokens))
    return jnp.transpose(toks)  # [B, T]


def beam_generate(
    model: Seq2SeqLM,
    params: typ.Mapping,
    enc_ids: jax.Array,
    enc_mask: jax.Array,
    *,
    num_beams: int = 4,
    max_new_tokens: int = 32,
    bos_id: int = 0,
    eos_id: int = 1,
    length_penalty: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """KV-cached beam search. Returns (tokens [B, max_new_tokens], scores [B]).

    tpu-native shape discipline: all `B * num_beams` beams decode as one
    batched `decode_step`; per step the `num_beams * V` continuations are
    pruned back to `num_beams` with one `lax.top_k`, and the self-attention
    caches are re-gathered along the beam axis with `jnp.take` — a static
    [B*K, L, H, Dh] gather each step, no dynamic shapes. Finished beams
    (emitted EOS) are frozen: they emit `bos_id` (T5 pad) at -0 incremental
    logprob and keep competing with their final length-penalized score
    (`sum logp / len**length_penalty`, HF convention).
    """
    b = enc_ids.shape[0]
    k = num_beams
    rep = lambda x: jnp.repeat(x, k, axis=0)  # [B, ...] -> [B*K, ...]
    mem = model.apply(params, rep(enc_ids), rep(enc_mask), method=Seq2SeqLM.encode)
    cache = model.apply(params, mem, max_new_tokens, method=Seq2SeqLM.init_cache)
    enc_mask_k = rep(enc_mask)
    neg_inf = jnp.float32(-1e9)

    def step(carry, _):
        tok, pos, cache, logps, lens, finished, toks = carry
        # tok [B*K]; logps/lens/finished [B, K]; toks [B, K, T]
        logits, cache = model.apply(
            params, tok, pos, enc_mask_k, cache, method=Seq2SeqLM.decode_step
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [B*K, V]
        v = logp.shape[-1]
        logp = logp.reshape(b, k, v)
        # finished beams: only the pad continuation, at zero incremental cost
        pad_only = jnp.full((v,), neg_inf).at[bos_id].set(0.0)
        logp = jnp.where(finished[..., None], pad_only[None, None, :], logp)
        cand = logps[..., None] + logp  # [B, K, V]
        flat = cand.reshape(b, k * v)
        new_logps, flat_idx = jax.lax.top_k(flat, k)  # [B, K]
        src_beam = flat_idx // v  # [B, K] which beam each winner extends
        new_tok = (flat_idx % v).astype(jnp.int32)

        # re-gather beam state along the beam axis
        gather_rows = (jnp.arange(b)[:, None] * k + src_beam).reshape(b * k)
        cache = jax.tree.map(lambda x: jnp.take(x, gather_rows, axis=0), cache)
        toks = jnp.take_along_axis(toks, src_beam[..., None], axis=1)
        lens = jnp.take_along_axis(lens, src_beam, axis=1)
        finished = jnp.take_along_axis(finished, src_beam, axis=1)

        toks = jax.lax.dynamic_update_slice_in_dim(toks, new_tok[..., None], pos, axis=2)
        lens = jnp.where(finished, lens, lens + 1)
        finished = finished | (new_tok == eos_id)
        return (new_tok.reshape(b * k), pos + 1, cache, new_logps, lens, finished, toks), None

    # first step: only beam 0 is live (all beams share the same BOS context)
    init_logps = jnp.tile(jnp.array([0.0] + [float(-1e9)] * (k - 1), jnp.float32), (b, 1))
    init = (
        jnp.full((b * k,), bos_id, jnp.int32),
        jnp.asarray(0, jnp.int32),
        cache,
        init_logps,
        jnp.zeros((b, k), jnp.int32),
        jnp.zeros((b, k), bool),
        jnp.zeros((b, k, max_new_tokens), jnp.int32),
    )
    (_, _, _, logps, lens, _, toks), _ = jax.lax.scan(step, init, None, length=max_new_tokens)
    scores = logps / jnp.maximum(lens, 1).astype(jnp.float32) ** length_penalty
    best = jnp.argmax(scores, axis=-1)  # [B]
    out = jnp.take_along_axis(toks, best[:, None, None], axis=1)[:, 0]
    return out, jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]


def realm_beam_generate(
    model: "Seq2SeqRealm",
    params: typ.Mapping,
    batch: RealmBatch,
    **kwargs: typ.Any,
) -> tuple[jax.Array, jax.Array]:
    """Beam-search answer generation for a Realm batch (the beam twin of
    `realm_generate`): [context; question] segments feed the reader encoder,
    `beam_generate` decodes. Returns (tokens [B*D, T], scores [B*D])."""
    ids = batch.lm__input_ids
    tt = batch.lm__token_type_ids
    mask = batch.lm__attention_mask
    b, d_, l = ids.shape
    enc_mask = ((tt < 2) & (mask > 0)).astype(jnp.int32).reshape(b * d_, l)
    reader_params = {"params": params["params"]["reader"]}
    return beam_generate(
        Seq2SeqLM(model.reader_cfg),
        reader_params,
        ids.reshape(b * d_, l) * enc_mask,
        enc_mask,
        **kwargs,
    )


def port_t5_seq2seq_weights(state_dict: typ.Mapping[str, typ.Any], cfg: T5EncoderConfig) -> dict:
    """HF `T5ForConditionalGeneration` state_dict -> flax `Seq2SeqLM` params.

    Handles tied lm_head (T5 default: logits = h * d_model**-0.5 @ shared.T —
    the scale is folded into the ported kernel so the flax module needs no
    tie-awareness). Reference keeps the HF module whole; here the tensors map
    into the native layout once.
    """

    def g(key: str) -> np.ndarray:
        v = state_dict[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    shared = g("shared.weight") if "shared.weight" in state_dict else g("encoder.embed_tokens.weight")
    params: dict = {
        "encoder": port_t5_encoder_weights(state_dict, cfg),
        "dec_embed": {"embedding": shared},
        "final_norm": {"weight": g("decoder.final_layer_norm.weight")},
    }
    # HF state_dicts contain lm_head.weight even when tied to shared; tied
    # models scale decoder output by d_model**-0.5 pre-head, so fold that into
    # the ported kernel exactly when the tensors are tied.
    head = g("lm_head.weight") if "lm_head.weight" in state_dict else shared
    tied = head is shared or (head.shape == shared.shape and np.array_equal(head, shared))
    params["lm_head"] = {"kernel": head.T * (cfg.hidden_size ** -0.5 if tied else 1.0)}
    for i in range(cfg.num_layers):
        p = f"decoder.block.{i}."
        blk = {
            "ln0": {"weight": g(p + "layer.0.layer_norm.weight")},
            "self_q": {"kernel": g(p + "layer.0.SelfAttention.q.weight").T},
            "self_k": {"kernel": g(p + "layer.0.SelfAttention.k.weight").T},
            "self_v": {"kernel": g(p + "layer.0.SelfAttention.v.weight").T},
            "self_o": {"kernel": g(p + "layer.0.SelfAttention.o.weight").T},
            "ln1": {"weight": g(p + "layer.1.layer_norm.weight")},
            "cross_attention": {
                "q": {"kernel": g(p + "layer.1.EncDecAttention.q.weight").T},
                "k": {"kernel": g(p + "layer.1.EncDecAttention.k.weight").T},
                "v": {"kernel": g(p + "layer.1.EncDecAttention.v.weight").T},
                "o": {"kernel": g(p + "layer.1.EncDecAttention.o.weight").T},
            },
            "ln2": {"weight": g(p + "layer.2.layer_norm.weight")},
            "wi": {"kernel": g(p + "layer.2.DenseReluDense.wi.weight").T},
            "wo": {"kernel": g(p + "layer.2.DenseReluDense.wo.weight").T},
        }
        if i == 0:
            blk["relative_attention_bias"] = g(
                p + "layer.0.SelfAttention.relative_attention_bias.weight"
            )
        params[f"block_{i}"] = blk
    return params


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
        ans_ids, ans_m = compact_answer_segment(ids_f, tt_f, mask_f, min(l, 64))
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


def realm_generate(
    model: Seq2SeqRealm,
    params: typ.Mapping,
    batch: RealmBatch,
    **kwargs: typ.Any,
) -> jax.Array:
    """KV-cached answer generation for a Realm batch: the collate's
    [context; question] segments (token_type_ids < 2) feed the reader encoder;
    decoding runs under `generate`. Returns tokens [B*D, max_new_tokens].

    (Generation drives pure `apply` calls from outside the module — raw
    `lax.scan` over bound flax submodules is not allowed inside methods.)
    """
    ids = batch.lm__input_ids
    tt = batch.lm__token_type_ids
    mask = batch.lm__attention_mask
    b, d_, l = ids.shape
    enc_mask = ((tt < 2) & (mask > 0)).astype(jnp.int32).reshape(b * d_, l)
    reader_params = {"params": params["params"]["reader"]}
    return generate(
        Seq2SeqLM(model.reader_cfg),
        reader_params,
        ids.reshape(b * d_, l) * enc_mask,
        enc_mask,
        **kwargs,
    )
