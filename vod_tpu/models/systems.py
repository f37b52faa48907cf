"""VOD systems: Ranker (dual encoder) and Realm (ranker + reader LM).

Parity: reference `src/vod_models/vod_systems/` — `VodSystem` dispatches one
`forward(batch, mode=encode|evaluate|generate)` (`base.py:37-51`); `Ranker`
concatenates query+section tokens into ONE encoder pass and splits the pooled
embeddings (`ranker.py:76-125`); `Realm` adds LM logits over the flattened
`lm__input_ids` (`realm.py:43-62`).
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import linen as nn

from vod_tpu.types.batch import RealmBatch, RealmOutput
from .encoder import DebugEncoder, TransformerEncoderConfig, VodEncoder
from .gradients import Gradients
from .lm import CausalLM, CausalLMConfig


def _pad_to(x: jax.Array, length: int) -> jax.Array:
    if x.shape[-1] == length:
        return x
    return jnp.pad(x, ((0, 0), (0, length - x.shape[-1])))


def _fused_encode(encoder, batch: RealmBatch) -> dict[str, jax.Array]:
    """One fused encoder pass over query+section tokens (`ranker.py:76-125`).

    When `batch.extras['flat_sections']` is set (in-batch negatives), the
    section pool is SHARED across queries and the section encoding stays 2-d
    [U, H]; the gradient estimators' score einsum handles both layouts
    (parity: `_compute_retriever_scores`, `retrieval.py:193-198`).
    """
    q_ids, q_mask = batch.query__input_ids, batch.query__attention_mask
    s_ids, s_mask = batch.section__input_ids, batch.section__attention_mask
    b = q_ids.shape[0]
    length = max(q_ids.shape[-1], s_ids.shape[-1])
    ids = jnp.concatenate([_pad_to(q_ids, length), _pad_to(s_ids, length)], axis=0)
    mask = jnp.concatenate([_pad_to(q_mask, length), _pad_to(s_mask, length)], axis=0)
    pooled = encoder(ids, mask)
    query_encoding = pooled[:b]
    section_encoding = pooled[b:]
    if not batch.extras.get("flat_sections", False):
        d = section_encoding.shape[0] // b
        section_encoding = section_encoding.reshape(b, d, -1)
    return {"query_encoding": query_encoding, "section_encoding": section_encoding}


class Ranker(nn.Module):
    """Dual-encoder ranker with a shared encoder.

    `encode` runs query and section tokens through ONE fused encoder forward
    (`ranker.py:76-125`: "concatenates into one encoder pass") — on TPU this
    keeps the MXU fed with a single large batch instead of two small ones.
    """

    cfg: TransformerEncoderConfig
    gradients: Gradients
    debug_encoder: bool = False
    splade_encoder: bool = False  # learned-sparse (SPLADE) encoder: encodings
    #                               are [*, V] vocab-impact vectors; the score
    #                               einsum is dimension-agnostic so the same
    #                               gradient estimators train it (beyond
    #                               reference — upstream is dense-only)
    splade_flops_weight: float = 0.0

    def setup(self) -> None:
        if self.splade_encoder:
            from .splade import SpladeEncoder

            self.encoder = SpladeEncoder(
                self.cfg, flops_weight=self.splade_flops_weight, name="encoder"
            )
        else:
            enc_cls = DebugEncoder if self.debug_encoder else VodEncoder
            self.encoder = enc_cls(self.cfg, name="encoder")

    def encode(self, batch: RealmBatch) -> dict[str, jax.Array]:
        return _fused_encode(self.encoder, batch)

    def encode_field(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        """Single-field encoding (the Predict/embedding pipeline entry)."""
        return self.encoder(input_ids, attention_mask)

    def encode_field_tokens(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        """Per-token embeddings `[B, T, H]` for late-interaction (MaxSim)
        indexing (`search.maxsim.build_maxsim_index`); VodEncoder only."""
        return self.encoder.tokens(input_ids, attention_mask)

    def evaluate(self, batch: RealmBatch) -> RealmOutput:
        enc = self.encode(batch)
        return self.gradients(batch=batch, **enc)

    def __call__(self, batch: RealmBatch, mode: str = "evaluate") -> typ.Any:
        if mode == "encode":
            return self.encode(batch)
        if mode == "evaluate":
            return self.evaluate(batch)
        raise ValueError(f"Unknown mode: {mode}")


class Realm(nn.Module):
    """Ranker + autoregressive reader (parity: `realm.py:20-63`)."""

    cfg: TransformerEncoderConfig
    lm_cfg: CausalLMConfig
    gradients: Gradients
    debug_encoder: bool = False

    def setup(self) -> None:
        enc_cls = DebugEncoder if self.debug_encoder else VodEncoder
        self.encoder = enc_cls(self.cfg, name="encoder")
        self.lm = CausalLM(self.lm_cfg, name="lm")

    def encode(self, batch: RealmBatch) -> dict[str, jax.Array]:
        return _fused_encode(self.encoder, batch)

    def encode_field(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        return self.encoder(input_ids, attention_mask)

    def _forward_lm(self, batch: RealmBatch) -> jax.Array:
        """LM logits over `[B*D, L]`-flattened reader inputs (`realm.py:56-62`)."""
        ids = batch.lm__input_ids
        mask = batch.lm__attention_mask
        flat_ids = ids.reshape(-1, ids.shape[-1])
        flat_mask = mask.reshape(-1, mask.shape[-1])
        return self.lm(flat_ids, flat_mask)

    def evaluate(self, batch: RealmBatch) -> RealmOutput:
        enc = self.encode(batch)
        lm_logits = self._forward_lm(batch)
        return self.gradients(batch=batch, lm_logits=lm_logits, **enc)

    def generate(self, batch: RealmBatch, max_new_tokens: int = 16) -> jax.Array:
        """Greedy decoding from the reader over [context; question] prompts.

        Parity: `VodSystem` mode="generate" dispatch (`vod_systems/base.py:37-51`).
        KV-cached: one prefill pass over the prompt fills per-layer caches, then
        each of the `max_new_tokens` scan steps is a single [N, 1] decode
        (`models/lm.py` prefill/decode_step — no quadratic recompute). Returns
        generated token ids [B*D, max_new_tokens].
        """
        ids = batch.lm__input_ids
        mask = batch.lm__attention_mask
        flat_ids = ids.reshape(-1, ids.shape[-1])
        flat_mask = mask.reshape(-1, mask.shape[-1])
        n, l = flat_ids.shape
        logits_all, cache = self.lm.prefill(flat_ids, flat_mask, l + max_new_tokens)
        last = jnp.sum(flat_mask > 0, axis=-1) - 1  # [N] last valid position
        logits = logits_all[jnp.arange(n), last]

        def step(carry, _):
            logits, cache = carry
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            logits, cache = self.lm.decode_step(nxt, cache)
            return (logits, cache), nxt

        (_, _), toks = jax.lax.scan(step, (logits, cache), jnp.arange(max_new_tokens))
        return jnp.moveaxis(toks, 0, 1)  # [N, T]

    def __call__(self, batch: RealmBatch, mode: str = "evaluate", **kw: typ.Any) -> typ.Any:
        if mode == "encode":
            return self.encode(batch)
        if mode == "evaluate":
            return self.evaluate(batch)
        if mode == "generate":
            return self.generate(batch, **kw)
        raise ValueError(f"Unknown mode: {mode}")
