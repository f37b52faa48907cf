"""Expert parallelism (EP): mixture-of-experts FFN over a mesh axis.

Beyond-reference extension (the reference has no MoE — SURVEY §2.10 marks EP
absent). TPU-first design: no ragged dispatch, no host-side routing. Tokens
are routed with a top-k softmax gate and dispatched to experts through one-hot
combine/dispatch einsums — everything is a static-shape matmul on the MXU, so
the same program runs replicated or with the expert axis of every weight
sharded over `ep` (GSPMD turns the dispatch einsums into an all-to-all).

Capacity model: each expert processes at most `capacity = ceil(k·T/E · cf)`
tokens per batch row group; overflow tokens fall through the residual (their
expert output is 0), the standard GShard/Switch behavior. The auxiliary
load-balancing loss (mean gate prob x token fraction per expert, scaled by E)
follows Switch Transformer (Fedus et al., 2021, eq. 4-6).
"""

from __future__ import annotations

import math
import typing as typ

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MoEFFN(nn.Module):
    """Drop-in FFN replacement: top-k routed experts, einsum dispatch.

    Weights: `gate [H, E]`, `wi [E, H, I]`, `wo [E, I, H]` — the leading expert
    axis is the one `ep_sharding` shards over the `ep` mesh axis.
    """

    n_experts: int
    intermediate_size: int
    top_k: int = 1
    capacity_factor: float = 1.25
    dtype: typ.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """[B, T, H] -> ([B, T, H], aux_loss scalar)."""
        x = x.astype(self.dtype)
        b, t, h = x.shape
        e, k = self.n_experts, self.top_k
        cap = max(1, math.ceil(k * t / e * self.capacity_factor))

        gate_w = self.param("gate", nn.initializers.lecun_normal(), (h, e), jnp.float32)
        wi = self.param(
            "wi", nn.initializers.lecun_normal(), (e, h, self.intermediate_size), jnp.float32
        )
        wo = self.param(
            "wo", nn.initializers.lecun_normal(), (e, self.intermediate_size, h), jnp.float32
        )

        logits = jnp.einsum("bth,he->bte", x.astype(jnp.float32), gate_w)
        probs = jax.nn.softmax(logits, axis=-1)  # [B, T, E]
        top_p, top_e = jax.lax.top_k(probs, k)  # [B, T, k]

        # position of each token within its chosen expert's capacity buffer:
        # cumulative count of earlier tokens routed to the same expert
        onehot = jax.nn.one_hot(top_e, e, dtype=jnp.int32)  # [B, T, k, E]
        flat = onehot.reshape(b, t * k, e)
        pos = jnp.cumsum(flat, axis=1) - flat  # [B, T*k, E] slots before me
        pos = jnp.sum(pos * flat, axis=-1).reshape(b, t, k)  # [B, T, k]
        keep = pos < cap

        # dispatch tensor [B, T, E, cap]: token t -> (expert, slot) one-hots
        disp = (
            jax.nn.one_hot(top_e, e, dtype=x.dtype)[..., None]
            * jax.nn.one_hot(pos, cap, dtype=x.dtype)[..., None, :]
            * keep[..., None, None].astype(x.dtype)
        ).sum(axis=2)  # sum over k
        # combine tensor weights slots by the (renormalized) gate prob
        gates = top_p / jnp.maximum(jnp.sum(top_p, axis=-1, keepdims=True), 1e-9)
        comb = (
            jax.nn.one_hot(top_e, e, dtype=jnp.float32)[..., None]
            * jax.nn.one_hot(pos, cap, dtype=jnp.float32)[..., None, :]
            * (gates * keep).astype(jnp.float32)[..., None, None]
        ).sum(axis=2)  # [B, T, E, cap]

        xe = jnp.einsum("bth,btec->bech", x, disp)  # [B, E, cap, H]
        he = jax.nn.gelu(jnp.einsum("bech,ehi->beci", xe, wi.astype(x.dtype)))
        ye = jnp.einsum("beci,eih->bech", he, wo.astype(x.dtype))  # [B, E, cap, H]
        y = jnp.einsum("bech,btec->bth", ye.astype(jnp.float32), comb).astype(x.dtype)

        # Switch aux loss: E * mean_e(frac_tokens_e * mean_gate_prob_e)
        frac = jnp.mean(jax.nn.one_hot(top_e[..., 0], e, dtype=jnp.float32), axis=(0, 1))
        mean_p = jnp.mean(probs, axis=(0, 1))
        aux = e * jnp.sum(frac * mean_p)
        return y, aux


def ep_sharding(params: typ.Any, mesh: Mesh, axis: str = "ep") -> typ.Any:
    """Shard every leading-expert-axis weight (`wi`/`wo`) over `axis`; the gate
    and everything else replicate. Compose after fsdp/tp rules if mixing."""
    if axis not in mesh.shape:
        # no ep axis on this mesh: replicate everything (mirrors how the
        # fsdp/tp rules degrade, so the rules compose on any mesh)
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    size = mesh.shape[axis]

    def rule(path, x) -> NamedSharding:
        key = jax.tree_util.keystr(path)
        nd = getattr(x, "ndim", 0)
        if nd == 3 and ("wi" in key or "wo" in key) and x.shape[0] % size == 0:
            return NamedSharding(mesh, P(axis, None, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params_ep(params: typ.Any, mesh: Mesh, axis: str = "ep") -> typ.Any:
    return jax.device_put(params, ep_sharding(params, mesh, axis))
