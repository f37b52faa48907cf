"""Sequence parallelism (SP): ring attention over a mesh axis.

Beyond-reference extension (the reference avoids long contexts entirely via
sectioning — SURVEY §5 "Long-context / sequence parallelism: absent"). This
provides the TPU-native long-context primitive: the sequence axis of Q/K/V is
sharded over the `sp` mesh axis, each device holds one sequence block, and K/V
blocks rotate around the ring with `lax.ppermute` while a streaming-softmax
accumulator (the flash-attention recurrence: running max `m`, denominator `l`,
numerator `acc`) folds in one block per step. Attention over a sequence of
length T costs each device O(T/n · T) FLOPs and O(T/n) memory — no device ever
materializes the full [T, T] score matrix or the full K/V.

Communication: n-1 ppermute steps of the local K/V block over ICI, fully
overlappable with the per-block matmuls. Backward is jax AD through the scan;
for long sequences wrap the call in `jax.checkpoint`.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ring_attention_local(
    q: jax.Array,  # [B, Tq_local, H, Dh]
    k: jax.Array,  # [B, Tk_local, H, Dh]
    v: jax.Array,  # [B, Tk_local, H, Dh]
    kv_mask: jax.Array,  # [B, Tk_local] bool — True = attend
    axis: str,
) -> jax.Array:
    """Per-device body (inside shard_map): local Q against the rotating K/V ring."""
    n = jax.lax.axis_size(axis)
    b, tq, h, dh = q.shape
    scale = dh**-0.5
    qf = q.astype(jnp.float32) * scale
    perm = [(i, (i + 1) % n) for i in range(n)]

    acc0 = jnp.zeros((b, tq, h, dh), jnp.float32)
    m0 = jnp.full((b, h, tq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, tq), jnp.float32)
    # finite big-negative masking (what flax attention does): masked keys
    # underflow to weight 0 next to any real score, and a FULLY-masked query
    # degrades to the uniform average of V — matching the sequential forward
    # on all-padding rows instead of returning 0
    neg = jnp.finfo(jnp.float32).min

    def step(carry, _):
        k_c, v_c, mask_c, acc, m, l = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_c.astype(jnp.float32))
        s = jnp.where(mask_c[:, None, None, :], s, neg)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))  # >= neg, always finite
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)  # first step: exp(-inf - finite) = 0
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * jnp.moveaxis(corr, 1, 2)[..., None] + jnp.einsum(
            "bhqk,bkhd->bqhd", p, v_c.astype(jnp.float32)
        )
        m = m_new
        k_n = jax.lax.ppermute(k_c, axis, perm)
        v_n = jax.lax.ppermute(v_c, axis, perm)
        mask_n = jax.lax.ppermute(mask_c, axis, perm)
        return (k_n, v_n, mask_n, acc, m, l), None

    (_, _, _, acc, _, l), _ = jax.lax.scan(step, (k, v, kv_mask, acc0, m0, l0), None, length=n)
    denom = jnp.moveaxis(l, 1, 2)[..., None]  # [B, Tq, H, 1]
    return (acc / jnp.maximum(denom, 1e-30)).astype(q.dtype)


def ring_attention(
    q: jax.Array,  # [B, T, H, Dh]
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
    kv_mask: typ.Optional[jax.Array] = None,  # [B, T] bool — True = attend
) -> jax.Array:
    """Sequence-sharded multi-head attention, exact (not approximate).

    Returns softmax(QKᵀ/√d)·V == the unsharded computation (up to f32
    accumulation order), with Q/K/V/output sequence axes sharded over `axis`.
    Padding keys are excluded via `kv_mask`; a fully-masked query returns the
    uniform average of V (the same degenerate softmax flax's finite
    big-negative masking produces on all-padding rows).
    """
    if q.shape[1] % mesh.shape[axis]:
        raise ValueError(
            f"sequence length {q.shape[1]} does not shard over {axis}={mesh.shape[axis]}"
        )
    if kv_mask is None:
        kv_mask = jnp.ones(k.shape[:2], bool)

    fn = jax.shard_map(
        lambda qq, kk, vv, mm: _ring_attention_local(qq, kk, vv, mm, axis),
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(q, k, v, kv_mask.astype(bool))


def sp_encoder_forward(
    params: typ.Any,
    cfg: typ.Any,  # TransformerEncoderConfig
    input_ids: jax.Array,
    attention_mask: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
) -> jax.Array:
    """`TransformerEncoder.__call__` with every attention block computed by
    `ring_attention` over sequence-sharded activations.

    Numerically matches the sequential forward (the flax attention module's
    einsums are reproduced exactly from the same params: qkv/out projections
    `[H, heads, Dh]`, softmax in f32). Embeddings/FFN/LayerNorm are pointwise
    over the sequence axis, so GSPMD keeps them sharded over `axis` for free —
    the classic "sequence parallelism outside attention" layout.
    """
    from vod_tpu.models.encoder import _Embeddings

    if getattr(cfg, "moe_experts", 0) > 0 or getattr(cfg, "lora_rank", 0) > 0:
        raise ValueError(
            "sp_encoder_forward reproduces the dense FFN layout only; "
            "moe_experts/lora_rank configs are not supported"
        )
    h = _Embeddings(cfg).apply({"params": params["embeddings"]}, input_ids, None)
    kv_mask = attention_mask > 0
    heads = cfg.num_heads
    dh = cfg.hidden_size // heads
    eps = cfg.layer_norm_eps

    def dense_g(p: typ.Any, x: jax.Array, contract: str) -> jax.Array:
        return jnp.einsum(contract, x, p["kernel"].astype(x.dtype)) + p["bias"].astype(x.dtype)

    def layer_norm(p: typ.Any, x: jax.Array) -> jax.Array:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + eps)
        return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)

    for i in range(cfg.num_layers):
        lp = params[f"layer_{i}"]
        ap = lp["attention"]
        # flax MultiHeadDotProductAttention kernels: [H, heads, Dh]
        xq = jnp.einsum("bth,hnd->btnd", h, ap["query"]["kernel"].astype(h.dtype)) + ap["query"]["bias"].astype(h.dtype)
        xk = jnp.einsum("bth,hnd->btnd", h, ap["key"]["kernel"].astype(h.dtype)) + ap["key"]["bias"].astype(h.dtype)
        xv = jnp.einsum("bth,hnd->btnd", h, ap["value"]["kernel"].astype(h.dtype)) + ap["value"]["bias"].astype(h.dtype)
        attn = ring_attention(xq, xk, xv, mesh=mesh, axis=axis, kv_mask=kv_mask)
        attn_out = jnp.einsum("btnd,ndh->bth", attn, ap["out"]["kernel"].astype(h.dtype)) + ap["out"]["bias"].astype(h.dtype)
        h = layer_norm(lp["attention_norm"], h + attn_out)
        ff = dense_g(lp["intermediate"], h, "bth,hi->bti")
        ff = jax.nn.gelu(ff)
        ff = dense_g(lp["output"], ff, "bti,ih->bth")
        h = layer_norm(lp["output_norm"], h + ff)
    return h
