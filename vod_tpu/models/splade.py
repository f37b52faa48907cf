"""SPLADE learned-sparse encoder: MLM-head term expansion on the MXU.

Beyond the reference (which only supports BM25 sparse via Elasticsearch,
`src/vod_search/es_search/`, and dense dual encoders,
`src/vod_models/vod_systems/ranker.py`): SPLADE (Formal et al., SIGIR'21)
represents queries and documents as sparse vocabulary-space impact vectors

    w_v(x) = max_t log(1 + relu(MLM(x)_{t,v}))          (max over tokens t)

so scoring is a dot product in vocab space and the *existing* device BM25
machinery (`search/sparse.py` impact postings + term-at-a-time top-k) serves
the learned index unchanged — the learned impacts simply replace the BM25
impact formula in the postings table.

TPU notes: the head is one [B*T, H] x [H, V] matmul (the word-embedding table
transposed — weights tied exactly like HF BertForMaskedLM), fully MXU-bound.
Impacts stay dense [B, V] on device; only the build/query helpers take the
top-k sparsification (static shapes for XLA). The FLOPS regularizer
(sum_v mean_b(w)^2, the paper's eq. 4) rides the flax "losses" collection into
the train step exactly like the MoE aux loss (`runtime/train.py:100-104`).
"""

from __future__ import annotations

import functools
import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .encoder import TransformerEncoder, TransformerEncoderConfig


def flops_loss(impacts: jax.Array) -> jax.Array:
    """SPLADE FLOPS regularizer: `sum_v (mean_b w_{b,v})^2` — pushes the
    *average* activation of each vocab term to zero, sparsifying postings."""
    return jnp.sum(jnp.mean(impacts, axis=0) ** 2)


class SpladeEncoder(nn.Module):
    """Backbone + tied MLM head -> [B, V] non-negative impact vectors.

    Drop-in for `VodEncoder` in `Ranker` (the pooled "encoding" is the vocab
    impact vector; gradient estimators' score einsum is dimension-agnostic).
    The decoder weight is tied to the input word embeddings (HF
    BertForMaskedLM layout) so naver/splade-* checkpoints port losslessly via
    `port_splade_weights`.
    """

    cfg: TransformerEncoderConfig
    flops_weight: float = 0.0  # >0: sow pre-scaled FLOPS loss into "losses"

    def setup(self) -> None:
        self.backbone = TransformerEncoder(self.cfg, name="backbone")
        self.transform = nn.Dense(self.cfg.hidden_size, name="transform", dtype=self.cfg.dtype)
        self.transform_norm = nn.LayerNorm(
            epsilon=self.cfg.layer_norm_eps, name="transform_norm", dtype=self.cfg.dtype
        )
        self.decoder_bias = self.param(
            "decoder_bias", nn.initializers.zeros, (self.cfg.vocab_size,)
        )

    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        h = self.backbone(input_ids, attention_mask)  # [B, T, H]
        h = self.transform_norm(nn.gelu(self.transform(h)))
        # tied decoder: logits = h @ E^T + b (HF BertForMaskedLM weight tying)
        emb = self.backbone.variables["params"]["embeddings"]["word_embeddings"]["embedding"]
        logits = h @ jnp.asarray(emb).T.astype(h.dtype) + self.decoder_bias.astype(h.dtype)  # [B, T, V]
        acts = jnp.log1p(nn.relu(logits.astype(jnp.float32)))
        acts = acts * (attention_mask[..., None] > 0)  # padding tokens never win the max
        impacts = jnp.max(acts, axis=1)  # [B, V]
        if self.flops_weight > 0.0 and not self.is_initializing():
            self.sow("losses", "splade_flops", self.flops_weight * flops_loss(impacts))
        return impacts


def splade_topk_terms(impacts: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Sparsify [B, V] impacts to the top-k terms: returns (terms [B,k] int32
    with -1 padding where the impact is 0, weights [B,k] f32). Feed straight
    into `SearchQueries(terms=..., term_weights=...)`."""
    w, t = jax.lax.top_k(impacts, k)
    ok = w > 0.0
    return jnp.where(ok, t, -1).astype(jnp.int32), jnp.where(ok, w, 0.0)


def port_splade_weights(
    state_dict: typ.Mapping[str, typ.Any],
    cfg: TransformerEncoderConfig,
) -> dict:
    """torch BertForMaskedLM state_dict -> flax `SpladeEncoder` params subtree.

    Backbone tensors reuse `port_bert_weights` (which strips the `bert.`
    prefix); the MLM head maps `cls.predictions.transform.*` and the decoder
    bias (`cls.predictions.bias` / `cls.predictions.decoder.bias`). The decoder
    weight itself is tied to the word embeddings and is NOT ported separately.
    """
    from .hf_import import _t, port_bert_weights

    sd = dict(state_dict)
    backbone = port_bert_weights(sd, cfg)
    bias_key = "cls.predictions.bias" if "cls.predictions.bias" in sd else "cls.predictions.decoder.bias"
    return {
        "backbone": backbone,
        "transform": {
            "kernel": _t(sd["cls.predictions.transform.dense.weight"]).T,
            "bias": _t(sd["cls.predictions.transform.dense.bias"]),
        },
        "transform_norm": {
            "scale": _t(sd["cls.predictions.transform.LayerNorm.weight"]),
            "bias": _t(sd["cls.predictions.transform.LayerNorm.bias"]),
        },
        "decoder_bias": _t(sd[bias_key]),
    }


def splade_doc_terms(
    impacts: np.ndarray | jax.Array,  # [N, V] (chunk of document impacts)
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side top-k sparsification of document impacts for index building:
    returns (terms [N,k] int32 / -1, weights [N,k] f32)."""
    terms, weights = jax.jit(splade_topk_terms, static_argnums=1)(jnp.asarray(impacts), k)
    return np.asarray(terms), np.asarray(weights)


def encode_corpus_terms(
    apply_fn: typ.Callable[[typ.Any, jax.Array, jax.Array], jax.Array],
    params: typ.Any,
    input_ids: jax.Array,  # [N, L] tokenized corpus
    attention_mask: jax.Array,
    *,
    k: int,
    chunk: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """Chunked corpus encoding with ON-DEVICE top-k sparsification — the dense
    [N, V] impact matrix never materializes (122 GB at 1M x 30522 f32; the
    sparse [N, k] pair lists are ~1000x smaller). Returns host (terms [N,k]
    int32 / -1, weights [N,k] f32) ready for `build_impact_index`.

    `apply_fn(params, ids, mask) -> [b, V]` — typically the SPLADE Ranker's
    `encode_field` (mirrors `runtime/predict.compute_embeddings`).
    """
    n = input_ids.shape[0]
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    ids = jnp.pad(input_ids, ((0, pad), (0, 0))).reshape(n_chunks, chunk, -1)
    mask = jnp.pad(attention_mask, ((0, pad), (0, 0))).reshape(n_chunks, chunk, -1)

    @functools.partial(jax.jit, static_argnums=0)
    def run(k_static, params, ids, mask):
        def one(args):
            i, m = args
            return splade_topk_terms(apply_fn(params, i, m), k_static)

        return jax.lax.map(one, (ids, mask))

    terms, weights = run(k, params, ids, mask)
    terms = np.asarray(terms).reshape(-1, k)[:n]
    weights = np.asarray(weights).reshape(-1, k)[:n]
    return terms, weights
