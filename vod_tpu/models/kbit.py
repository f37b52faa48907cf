"""kbit (quantized-base) training — the QLoRA-style tweak.

Parity: reference `vod_models/support.py:23` `apply_tweaks` with
`prepare_for_kbit_training` (peft's `prepare_model_for_kbit_training`: the
frozen base weights live in a quantized format while LoRA adapters train in
full precision).

TPU-native design: frozen float kernels (ndim >= 2) are stored as **int8 codes
+ per-output-channel f32 scales** — 1 byte/param in HBM, ~4x less than f32 —
and dequantized *inside* the jitted step, where XLA fuses the `codes * scale`
elementwise into the consuming matmul so the full-precision tensor is a
transient. Gradients flow only through the trainable subset (LoRA adapters,
pooler, norms), so the optimizer state is also tiny.

Usage (with the encoder's LoRA tweak, `encoder.py` `lora_trainable_mask`):

    kb = kbit_prepare(params, lora_trainable_mask(params))
    def loss(trainable, frozen, batch):
        params = kbit_materialize(trainable, frozen, kb.treedef, kb.paths)
        return model.apply(params, batch, mode="evaluate").loss
    grads = jax.grad(loss)(kb.trainable, kb.frozen, batch)  # trainable only
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class QuantizedLeaf:
    """Per-output-channel symmetric int8 quantization of a float tensor."""

    codes: jax.Array  # int8, original shape
    scale: jax.Array  # f32, shape broadcastable to codes (last axis kept)
    dtype: typ.Any = struct.field(pytree_node=False, default=jnp.float32)

    def dequantize(self) -> jax.Array:
        return (self.codes.astype(jnp.float32) * self.scale).astype(self.dtype)


def quantize_leaf(x: jax.Array) -> QuantizedLeaf:
    """Symmetric int8 over all-but-last axes (per-output-channel for kernels)."""
    xf = x.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))
    absmax = jnp.max(jnp.abs(xf), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    codes = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return QuantizedLeaf(codes=codes, scale=scale, dtype=x.dtype)


@struct.dataclass
class KbitParams:
    """Partitioned parameter tree: trainable float leaves + quantized frozen
    leaves, keyed by flattened path (both dicts are jit-able pytrees)."""

    trainable: dict[str, jax.Array]
    frozen: dict[str, typ.Union[QuantizedLeaf, jax.Array]]
    treedef: typ.Any = struct.field(pytree_node=False, default=None)
    paths: tuple[str, ...] = struct.field(pytree_node=False, default=())


def kbit_prepare(params: typ.Any, trainable_mask: typ.Any) -> KbitParams:
    """Split params by the mask; int8-quantize frozen float kernels.

    Frozen leaves that can't quantize well (ndim < 2, non-float — biases,
    layer-norm scales, embeddings' int buffers) stay as-is but still receive
    no gradient.
    """
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    mask_leaves = jax.tree_util.tree_leaves(trainable_mask)
    assert len(leaves) == len(mask_leaves), "mask must mirror the param tree"
    trainable: dict[str, jax.Array] = {}
    frozen: dict[str, typ.Union[QuantizedLeaf, jax.Array]] = {}
    paths = []
    for (path, leaf), train in zip(leaves, mask_leaves):
        key = jax.tree_util.keystr(path)
        paths.append(key)
        if train:
            trainable[key] = leaf
        elif leaf.ndim >= 2 and jnp.issubdtype(leaf.dtype, jnp.floating):
            frozen[key] = quantize_leaf(leaf)
        else:
            frozen[key] = leaf
    return KbitParams(trainable=trainable, frozen=frozen, treedef=treedef, paths=tuple(paths))


def kbit_materialize(
    trainable: dict[str, jax.Array],
    frozen: dict[str, typ.Union[QuantizedLeaf, jax.Array]],
    treedef: typ.Any,
    paths: tuple[str, ...],
) -> typ.Any:
    """Rebuild the full param tree (dequantizing frozen leaves) for `apply`.

    Call INSIDE jit: XLA fuses the dequant into consumers, so only the int8
    codes persist in HBM.
    """
    merged = {**trainable, **frozen}
    ordered = [
        merged[key].dequantize() if isinstance(merged[key], QuantizedLeaf) else merged[key]
        for key in paths
    ]
    return jax.tree_util.tree_unflatten(treedef, ordered)


def full_params(params: typ.Any) -> typ.Any:
    """Materialize a KbitParams tree into apply-ready params; identity for
    plain trees. Call INSIDE jit so dequant fuses into consumers."""
    if isinstance(params, KbitParams):
        return kbit_materialize(params.trainable, params.frozen, params.treedef, params.paths)
    return params


def kbit_memory_bytes(kb: KbitParams) -> dict[str, int]:
    """Diagnostic: bytes held by trainable vs frozen (codes+scales) storage."""
    def nbytes(x):
        return x.size * x.dtype.itemsize

    t = sum(nbytes(v) for v in kb.trainable.values())
    f = 0
    for v in kb.frozen.values():
        if isinstance(v, QuantizedLeaf):
            f += nbytes(v.codes) + nbytes(v.scale)
        else:
            f += nbytes(v)
    return {"trainable": t, "frozen": f}
