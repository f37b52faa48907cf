"""Pipeline parallelism (PP): GPipe microbatch schedule over a mesh axis.

Beyond-reference extension (the reference has only DDP/FSDP — SURVEY §2.10
marks PP absent). TPU-first design: every stage is the SAME jitted program
(SPMD), stage parameters are stacked on a leading axis sharded over the `pp`
mesh axis, and activations move stage-to-stage with `lax.ppermute` over ICI.
The schedule is a single `lax.scan` of `n_micro + n_stages - 1` ticks; at tick
`t` stage `s` processes microbatch `t - s` (the usual GPipe trapezoid, bubbles
at both ends). Backward is plain jax AD through the scan + ppermute — XLA
reverses the ring permutes, so gradients pipeline in the opposite direction
without any hand-written schedule.

Memory notes: inputs are replicated across stages (stage 0 reads them; the
others carry them dead — negligible at the microbatch sizes PP targets, and
GSPMD drops unused shards after fusion). Activation live range is one
microbatch per stage plus the scan stack for backward; wrap `stage_fn` in
`jax.checkpoint` for long pipelines.
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_pipeline_stages(layer_params: typ.Sequence[typ.Any], n_stages: int) -> typ.Any:
    """Stack L per-layer param pytrees into leaves [n_stages, L/n_stages, ...].

    The leading axis is the one `pipeline_apply` shards over the pp mesh axis;
    the second is the within-stage layer axis (looped locally).
    """
    n_layers = len(layer_params)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers do not split into {n_stages} equal stages")
    per = n_layers // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)
    return jax.tree.map(
        lambda x: x.reshape((n_stages, per) + x.shape[1:]), stacked
    )


def pipeline_apply(
    stage_params: typ.Any,
    x: jax.Array,
    stage_fn: typ.Callable[[typ.Any, jax.Array, typ.Any], jax.Array],
    *,
    mesh: Mesh,
    axis: str = "pp",
    n_micro: typ.Optional[int] = None,
    const: typ.Any = None,
) -> jax.Array:
    """Run `x` through `n_stages` pipelined stages of `stage_fn`.

    Args:
      stage_params: pytree with leaves `[n_stages, ...]`, stage axis sharded
        over `axis` (see `stack_pipeline_stages`).
      x: `[B, ...]` activations entering stage 0. `B` must divide into
        `n_micro` microbatches.
      stage_fn: `(params_one_stage, x_mb, const_mb) -> y_mb` — one stage's
        forward; output shape must equal input shape (inter-stage contract).
      n_micro: microbatch count (default: the stage count — the smallest
        schedule that fills the pipeline).
      const: optional pytree of per-example side inputs (e.g. attention masks),
        leaves `[B, ...]`; each stage receives the slice matching the
        microbatch it is processing that tick.

    Returns `[B, ...]` outputs of the last stage, replicated over `axis`.
    """
    n_stages = mesh.shape[axis]
    if n_micro is None:
        n_micro = n_stages
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} does not divide into {n_micro} microbatches")
    mb = b // n_micro
    x_mb = x.reshape((n_micro, mb) + x.shape[1:])
    const_mb = jax.tree.map(
        lambda c: c.reshape((n_micro, mb) + c.shape[1:]), const
    )

    stage_spec = jax.tree.map(lambda _: P(axis), stage_params)
    rep = jax.tree.map(lambda _: P(), const_mb)

    def shard_fn(sp: typ.Any, xm: jax.Array, cm: typ.Any) -> jax.Array:
        sp = jax.tree.map(lambda a: a[0], sp)  # local [1, ...] -> this stage's params
        stage = jax.lax.axis_index(axis)
        ticks = n_micro + n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(buf: jax.Array, t: jax.Array):
            # stage 0 injects microbatch t; others consume the ring buffer
            inp = jnp.where(stage == 0, xm[jnp.minimum(t, n_micro - 1)], buf)
            mb_idx = jnp.clip(t - stage, 0, n_micro - 1)
            c = jax.tree.map(lambda a: a[mb_idx], cm)
            out = stage_fn(sp, inp, c)
            return jax.lax.ppermute(out, axis, perm), out

        buf0 = jnp.zeros_like(x_mb[0])
        _, outs = jax.lax.scan(tick, buf0, jnp.arange(ticks))
        # the last stage emits microbatch m at tick m + n_stages - 1
        y = outs[n_stages - 1 :]
        y = jnp.where(stage == n_stages - 1, y, jnp.zeros_like(y))
        y = jax.lax.psum(y, axis)  # exactly one non-zero contributor
        return y.reshape((b,) + y.shape[2:])

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(stage_spec, P(), rep),
        out_specs=P(),
        check_vma=False,
    )(stage_params, x_mb, const_mb)


def pp_encoder_forward(
    params: typ.Any,
    cfg: typ.Any,  # TransformerEncoderConfig
    input_ids: jax.Array,
    attention_mask: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pp",
    n_micro: typ.Optional[int] = None,
) -> jax.Array:
    """`TransformerEncoder.__call__` with the layer stack pipelined over `axis`.

    `params` is the encoder's param tree (`{'embeddings': ..., 'layer_i': ...}`,
    as initialized by `models.encoder.TransformerEncoder`). Embeddings run
    replicated (they are a lookup, not a pipeline stage); the `num_layers`
    transformer layers split into `mesh.shape[axis]` equal stages. Numerically
    identical to the sequential forward (same params, same order).
    """
    from vod_tpu.models.encoder import _Embeddings, _Layer

    h = _Embeddings(cfg).apply({"params": params["embeddings"]}, input_ids, None)
    mask = attention_mask[:, None, None, :] > 0

    n_stages = mesh.shape[axis]
    layer_ps = [params[f"layer_{i}"] for i in range(cfg.num_layers)]
    stacked = stack_pipeline_stages(layer_ps, n_stages)
    layer = _Layer(cfg)
    per = cfg.num_layers // n_stages

    def stage_fn(sp: typ.Any, x: jax.Array, m: jax.Array) -> jax.Array:
        for j in range(per):
            pj = jax.tree.map(lambda a, _j=j: a[_j], sp)
            x = layer.apply({"params": pj}, x, m)
        return x

    return pipeline_apply(
        stacked, h, stage_fn, mesh=mesh, axis=axis, n_micro=n_micro, const=mask
    )
