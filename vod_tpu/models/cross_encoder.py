"""Cross-encoder (monoBERT-style) joint relevance reranker.

Beyond-reference extension: the reference scores query/section pairs only via
separate pooled embeddings (`vod_systems/ranker.py` dual encoder). A
cross-encoder feeds the CONCATENATED pair `[CLS] q [SEP] d [SEP]` through one
encoder so every attention layer sees both texts — the standard
quality-over-latency second stage (rerank the retriever's top candidates).

TPU-first shape: the [B, C] candidate grid flattens to one [B*C, L] batch so
the whole rerank is a single MXU-dense encoder pass; chunking via `lax.map`
bounds HBM. Composes with ANY first stage (dense/sparse/hybrid/MaxSim) the
same way `maxsim_search` does.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .encoder import TransformerEncoder, TransformerEncoderConfig
from vod_tpu.types.retrieval import RetrievalBatch


class CrossEncoder(nn.Module):
    """Backbone + HF-style tanh pooler + scalar relevance head.

    Layout matches `transformers.BertForSequenceClassification(num_labels=1)`
    so checkpoints port losslessly (`port_bert_cross_encoder_weights`).
    """

    cfg: TransformerEncoderConfig

    def setup(self) -> None:
        self.backbone = TransformerEncoder(self.cfg, name="backbone")
        self.hf_pooler = nn.Dense(self.cfg.hidden_size, name="hf_pooler")
        self.classifier = nn.Dense(1, name="classifier")

    def __call__(
        self,
        input_ids: jax.Array,  # [B, L]
        attention_mask: jax.Array,  # [B, L]
        token_type_ids: typ.Optional[jax.Array] = None,  # [B, L] 0=query 1=section
    ) -> jax.Array:
        h = self.backbone(input_ids, attention_mask, token_type_ids)
        cls = h[:, 0].astype(jnp.float32)
        pooled = jnp.tanh(self.hf_pooler(cls))
        return self.classifier(pooled)[:, 0]  # [B]


def cross_encoder_scores(
    apply_fn: typ.Callable[..., jax.Array],
    params: typ.Any,
    pair_input_ids: jax.Array,  # [B, C, L] tokenized [CLS] q [SEP] d [SEP]
    pair_attention_mask: jax.Array,  # [B, C, L]
    pair_token_type_ids: typ.Optional[jax.Array] = None,  # [B, C, L]
    *,
    chunk: int = 256,
) -> jax.Array:
    """Raw cross-encoder scores [B, C] for a candidate grid — the [B, C, L]
    pairs flatten to chunked [chunk, L] MXU passes via `lax.map`. Shared by
    `cross_encoder_rerank` (second-stage serving) and teacher-score computation
    for distillation (`fill_teacher_scores`)."""
    b, c, length = pair_input_ids.shape
    flat_n = b * c
    n_chunks = max(1, -(-flat_n // chunk))
    pad = n_chunks * chunk - flat_n

    def flat(x: typ.Optional[jax.Array]) -> typ.Optional[jax.Array]:
        if x is None:
            return None
        return jnp.pad(x.reshape(flat_n, length), ((0, pad), (0, 0))).reshape(
            n_chunks, chunk, length
        )

    ids_f, mask_f = flat(pair_input_ids), flat(pair_attention_mask)
    types_f = flat(pair_token_type_ids)

    def one(args):
        if types_f is None:
            ids, mask = args
            return apply_fn(params, ids, mask)
        ids, mask, types = args
        return apply_fn(params, ids, mask, types)

    operands = (ids_f, mask_f) if types_f is None else (ids_f, mask_f, types_f)
    return jax.lax.map(one, operands).reshape(-1)[:flat_n].reshape(b, c)


def cross_encoder_rerank(
    apply_fn: typ.Callable[..., jax.Array],
    params: typ.Any,
    candidates: RetrievalBatch,  # [B, C] first-stage results
    pair_input_ids: jax.Array,  # [B, C, L] tokenized [CLS] q [SEP] d [SEP]
    pair_attention_mask: jax.Array,  # [B, C, L]
    pair_token_type_ids: typ.Optional[jax.Array],  # [B, C, L]
    top_k: int,
    *,
    chunk: int = 256,
) -> RetrievalBatch:
    """Re-score first-stage candidates with the cross-encoder; top_k by its
    scores. `-1`-padded candidates keep `-inf` and sort last. Jittable —
    tokenization of the (query, section-text) pairs happens host-side.
    """
    b, c, _ = pair_input_ids.shape
    scores = cross_encoder_scores(
        apply_fn, params, pair_input_ids, pair_attention_mask, pair_token_type_ids, chunk=chunk
    )
    scores = jnp.where(candidates.indices >= 0, scores, -jnp.inf)

    k_eff = min(top_k, c)
    top_s, pos = jax.lax.top_k(scores, k_eff)
    top_i = jnp.take_along_axis(candidates.indices, pos, axis=-1)
    if k_eff < top_k:
        top_s = jnp.pad(top_s, ((0, 0), (0, top_k - k_eff)), constant_values=-jnp.inf)
        top_i = jnp.pad(top_i, ((0, 0), (0, top_k - k_eff)), constant_values=-1)
    ok = jnp.isfinite(top_s)
    return RetrievalBatch(
        scores=jnp.where(ok, top_s, -jnp.inf), indices=jnp.where(ok, top_i, -1)
    )


def fill_teacher_scores(
    apply_fn: typ.Callable[..., jax.Array],
    params: typ.Any,
    batch: typ.Any,  # RealmBatch
    pair_input_ids: jax.Array,  # [B, D, L] (query, section) pairs, batch order
    pair_attention_mask: jax.Array,
    pair_token_type_ids: typ.Optional[jax.Array] = None,
    *,
    chunk: int = 256,
) -> typ.Any:
    """Score the batch's sampled sections with a (frozen) cross-encoder teacher
    and return the batch with `section__teacher_score` set (-inf at padding) —
    the on-the-fly distillation path for `DistillationGradients`. Jittable;
    wrap `apply_fn` in `jax.lax.stop_gradient`-free params (the teacher is not
    differentiated because the student loss never touches its params)."""
    scores = cross_encoder_scores(
        apply_fn, params, pair_input_ids, pair_attention_mask, pair_token_type_ids, chunk=chunk
    )
    scores = jnp.where(jnp.isneginf(batch.section__score), -jnp.inf, scores)
    return batch.replace(section__teacher_score=scores)


def listwise_rerank_loss(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """Multi-positive listwise CE: -log sum_pos p(z) under softmax over valid
    candidates. `labels`: 1 = positive, 0 = negative, -1 = padding (masked).
    Matches the retriever's KL-to-binary-targets shape (reference
    `vod_gradients/retrieval.py:154`) so the cross-encoder trains on the same
    RealmBatch relevance labels.
    """
    valid = labels >= 0
    masked = jnp.where(valid, scores, -jnp.inf)
    log_z = jax.nn.logsumexp(masked, axis=-1)
    pos = jnp.where(labels > 0, masked, -jnp.inf)
    log_pos = jax.nn.logsumexp(pos, axis=-1)
    has_pos = jnp.any(labels > 0, axis=-1)
    loss = jnp.where(has_pos, log_z - log_pos, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(has_pos), 1.0)


def port_bert_cross_encoder_weights(
    state_dict: typ.Mapping[str, typ.Any],
    cfg: TransformerEncoderConfig,
) -> dict:
    """torch `BertForSequenceClassification` -> flax `CrossEncoder` params.

    Backbone layers reuse `port_bert_weights`; the HF pooler
    (`bert.pooler.dense`) and the scalar `classifier` head port directly.
    """
    from .hf_import import _t, port_bert_weights

    backbone = port_bert_weights(state_dict, cfg)
    sd = dict(state_dict)
    return {
        "backbone": backbone,
        "hf_pooler": {
            "kernel": _t(sd["bert.pooler.dense.weight"]).T,
            "bias": _t(sd["bert.pooler.dense.bias"]),
        },
        "classifier": {
            "kernel": _t(sd["classifier.weight"]).T,
            "bias": _t(sd["classifier.bias"]),
        },
    }


def tokenize_pairs(
    tokenizer: typ.Any,
    queries: typ.Sequence[str],
    sections: typ.Sequence[typ.Sequence[str]],
    *,
    max_length: int = 256,
) -> dict[str, np.ndarray]:
    """Host-side pair tokenization: [B, C, L] arrays for `cross_encoder_rerank`.

    Every query is paired with each of its C candidate section texts via the
    tokenizer's native `text_pair` path (correct [SEP] placement + segment
    ids). C must be rectangular (pad short candidate lists with "").
    """
    b = len(queries)
    c = len(sections[0]) if b else 0
    if any(len(s) != c for s in sections):
        raise ValueError("candidate lists must be rectangular; pad with empty strings")
    flat_q = [q for q, secs in zip(queries, sections) for _ in secs]
    flat_d = [d for secs in sections for d in secs]
    enc = tokenizer(
        flat_q,
        flat_d,
        max_length=max_length,
        truncation="longest_first",
        padding="max_length",
        return_tensors="np",
    )
    out = {
        "input_ids": enc["input_ids"].astype(np.int32).reshape(b, c, -1),
        "attention_mask": enc["attention_mask"].astype(np.int32).reshape(b, c, -1),
    }
    if "token_type_ids" in enc:
        out["token_type_ids"] = enc["token_type_ids"].astype(np.int32).reshape(b, c, -1)
    return out
