"""GradCache: constant-activation-memory gradients for the dual encoder.

Beyond reference (upstream trains at whatever batch fits the GPU). Technique:
Gao et al., "Scaling Deep Contrastive Learning Batch Size under Memory Limited
Setup" (arXiv:2101.06983). The REALM train step's memory wall is the encoder
activations over the fused [B*(1+S), L] row matrix (`systems.py:_fused_encode`)
— NOT the loss, which only touches the pooled [rows, H] encodings. GradCache
splits the step into two passes with EXACT gradients (same reassociation class
as grad accumulation):

  1. chunked forward, no activation retention: `lax.scan` over row chunks ->
     pooled encodings E [rows, H] (plus the sowed aux-loss total per chunk);
  2. `value_and_grad` of the estimator loss wrt E — a tiny graph over [rows, H];
  3. chunked VJP: re-run each chunk's forward under `jax.vjp` and pull the
     cached cotangent dL/dE_chunk (aux cotangent 1.0) back to the params,
     accumulating grads across chunks inside the same scan.

Peak activation memory = ONE chunk's encoder pass + E, independent of the
total row count — 16k+ in-batch negatives train on a single chip. XLA sees
three `lax.scan`s in one jitted program; each scan step is a full-width MXU
batch, so throughput stays at the fused pass's rate (~2x the FLOPs of the
monolithic step: forward runs twice, the standard GradCache trade).

TPU notes: static chunk count (rows padded up to a multiple of `chunk_rows`,
padding rows get zero attention mask and ZERO cotangent so they contribute
nothing to grads); works under `shard_map`/pjit dp sharding since every op is
batch-dim local ahead of the loss.

Aux-loss semantics: sowed losses that are BATCH statistics (the MoE
load-balance loss is a product of router means) are evaluated per chunk and
summed — a different, equally valid regularizer than the fused pass's, exactly
as under gradient accumulation. The retriever loss itself is bit-for-bit the
fused value (it only sees the pooled encodings).
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp

from vod_tpu.types.batch import RealmBatch, RealmOutput


def _fused_rows(batch: RealmBatch) -> tuple[jax.Array, jax.Array, int]:
    """The same query+section row concatenation as `systems._fused_encode`."""

    def pad_to(x, length):
        return x if x.shape[-1] == length else jnp.pad(x, ((0, 0), (0, length - x.shape[-1])))

    q_ids, q_mask = batch.query__input_ids, batch.query__attention_mask
    s_ids, s_mask = batch.section__input_ids, batch.section__attention_mask
    b = q_ids.shape[0]
    length = max(q_ids.shape[-1], s_ids.shape[-1])
    ids = jnp.concatenate([pad_to(q_ids, length), pad_to(s_ids, length)], axis=0)
    mask = jnp.concatenate([pad_to(q_mask, length), pad_to(s_mask, length)], axis=0)
    return ids, mask, b


def gradcache_value_and_grad(
    model: typ.Any,  # Ranker-like: encode_field method + .gradients estimator
    params: typ.Any,
    batch: RealmBatch,
    *,
    chunk_rows: int,
    param_transform: typ.Optional[typ.Callable[[typ.Any], typ.Any]] = None,
) -> tuple[tuple[jax.Array, RealmOutput], typ.Any]:
    """Drop-in for `jax.value_and_grad(loss, has_aux=True)(params)` on the
    retriever loss, at one-chunk activation memory.

    `param_transform` maps the differentiated params to the full apply params
    (kbit: `kbit_materialize`; identity otherwise). Returns
    `((loss, RealmOutput), grads)` with grads matching the monolithic step up
    to float reassociation.
    """
    if param_transform is None:
        param_transform = lambda p: p

    ids, mask, b = _fused_rows(batch)
    rows, length = ids.shape
    n_chunks = -(-rows // chunk_rows)
    pad = n_chunks * chunk_rows - rows
    if pad:
        ids = jnp.pad(ids, ((0, pad), (0, 0)))
        # padding rows keep ONE valid token: an all-zero mask mean-pools to an
        # exactly-zero vector whose L2-norm gradient is NaN, and `0 * NaN`
        # would poison the chunk VJP even under a zero cotangent. One real
        # token keeps every Jacobian finite; the zero cotangent then exactly
        # cancels the row's contribution.
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        mask = mask.at[rows:, 0].set(1)
    ids_c = ids.reshape(n_chunks, chunk_rows, length)
    mask_c = mask.reshape(n_chunks, chunk_rows, length)

    def enc_chunk(p, ic, mc):
        """One chunk's pooled encodings + its sowed aux-loss total."""
        full = param_transform(p)
        pooled, aux_vars = model.apply(
            full, ic, mc, method=type(model).encode_field, mutable=["losses"]
        )
        aux = sum(jnp.sum(v) for v in jax.tree.leaves(aux_vars.get("losses", {})))
        return pooled, aux

    # -- pass 1: embeddings, activations dropped between chunks -------------
    def fwd(aux_acc, inp):
        ic, mc = inp
        pooled, aux = enc_chunk(params, ic, mc)
        return aux_acc + aux, pooled

    aux_total, enc = jax.lax.scan(fwd, jnp.float32(0.0), (ids_c, mask_c))
    enc = enc.reshape(n_chunks * chunk_rows, -1)[:rows]

    # -- pass 2: loss + cotangent on the pooled encodings -------------------
    def loss_from_enc(e):
        q_enc = e[:b]
        s_enc = e[b:]
        if not batch.extras.get("flat_sections", False):
            s_enc = s_enc.reshape(b, s_enc.shape[0] // b, -1)
        out = model.gradients(batch=batch, query_encoding=q_enc, section_encoding=s_enc)
        return out.loss, out

    (loss, out), d_enc = jax.value_and_grad(loss_from_enc, has_aux=True)(enc)
    d_enc = jnp.pad(d_enc, ((0, pad), (0, 0))) if pad else d_enc
    d_enc_c = d_enc.reshape(n_chunks, chunk_rows, -1)
    # stop the cache: pass-2 ran on pass-1's values; the VJP below re-derives
    # the path from params, so the cotangent itself must be a constant
    d_enc_c = jax.lax.stop_gradient(d_enc_c)

    # -- pass 3: chunked VJP back to params, grads accumulated in the scan --
    def bwd(grads_acc, inp):
        ic, mc, ge = inp
        _, vjp = jax.vjp(lambda p: enc_chunk(p, ic, mc), params)
        (gp,) = vjp((ge, jnp.float32(1.0)))  # aux enters the total loss with weight 1
        return jax.tree.map(jnp.add, grads_acc, gp), None

    zero = jax.tree.map(jnp.zeros_like, params)
    grads, _ = jax.lax.scan(bwd, zero, (ids_c, mask_c, d_enc_c))
    return (loss + aux_total, out), grads
