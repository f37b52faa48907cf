"""Training: the fused live-retrieval train step + host-side loops.

Parity: reference `vod_ops/loops/train.py:21` (`training_loop`: grad accumulation,
clip, optimizer/scheduler step, interval logging/validation/checkpoint, live
engine-weight schedule updates) and `loops/val.py:14`.

TPU-first: ONE jitted program per step does
  encode queries (live, current params) -> hybrid search over the HBM index ->
  merge -> priority-sample -> gather section tokens -> model forward/backward ->
  optimizer update
— the reference's process topology (dataloader workers + HTTP search servers +
NCCL training ranks) collapses into this program. Engine weights arrive as traced
scalars (replacing `mp.Manager` shared dicts, `workflows/train.py:46`).
"""

from __future__ import annotations

import time
import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vod_tpu.models.monitoring import RetrievalMonitor
from vod_tpu.search.hybrid import HybridEngines
from vod_tpu.types.batch import RealmBatch
from .collate import DeviceCorpus, QueryBatch, device_collate
from .state import TrainerState


class RealmTrainStep:
    """Factory for the fused train/eval steps of a Ranker/Realm system."""

    def __init__(
        self,
        model: typ.Any,  # flax module with evaluate/encode_field methods
        tx: optax.GradientTransformation,
        *,
        prefetch: int = 100,
        n_sections: int = 8,
        max_pos_sections: int = 2,
        temperature: float = 1.0,
        max_support_size: typ.Optional[int] = None,
        with_lm: bool = False,
        gradient_clip_val: typ.Optional[float] = None,
        in_batch_negatives: bool = False,
        accumulate_grad_batches: int = 1,
        splade_query_k: typ.Optional[int] = None,
        gradcache_chunk_rows: typ.Optional[int] = None,
    ):
        if gradcache_chunk_rows is not None and with_lm:
            # GradCache caches the pooled [rows, H] encodings; the Realm reader
            # consumes full lm logits, which would defeat the memory saving.
            raise ValueError("gradcache_chunk_rows requires a retriever-only (Ranker) system")
        self.model = model
        self.tx = tx
        # GradCache (Gao et al. 2021): chunk the fused encoder pass so the
        # activation peak is ONE chunk, enabling beyond-HBM effective batch
        # sizes (e.g. 16k in-batch negatives) — beyond reference
        self.gradcache_chunk_rows = gradcache_chunk_rows
        # learned-sparse live retrieval: encode_field returns [B, V] impacts;
        # sparsify to the top-k query terms and search the impact postings
        # (instead of a dense query vector) — beyond reference
        self.splade_query_k = splade_query_k
        self.prefetch = prefetch
        self.n_sections = n_sections
        self.max_pos_sections = max_pos_sections
        self.temperature = temperature
        self.max_support_size = max_support_size
        self.with_lm = with_lm
        self.gradient_clip_val = gradient_clip_val
        self.in_batch_negatives = in_batch_negatives
        self.accumulate_grad_batches = accumulate_grad_batches
        self._step = jax.jit(self._train_step, donate_argnums=(0, 1), static_argnames=("engine_names",))
        self._step_accum = jax.jit(
            self._train_step_accum, donate_argnums=(0, 1), static_argnames=("engine_names",)
        )
        self._eval = jax.jit(self._eval_step, static_argnames=("engine_names",))

    # -- collate + forward -------------------------------------------------
    def _collate(self, params, rng, engines, corpus, queries, weights_tuple, engine_names):
        from vod_tpu.models.kbit import full_params

        params = full_params(params)  # kbit: dequantized view for the query encode
        weights = dict(zip(engine_names, weights_tuple)) if engine_names else None
        q_vec = None
        if self.splade_query_k is not None:
            # live learned-sparse retrieval: query impacts from the CURRENT
            # encoder -> top-k (terms, weights) -> the impact postings engine
            from vod_tpu.models.splade import splade_topk_terms

            impacts = jax.lax.stop_gradient(
                self.model.apply(
                    params, queries.input_ids, queries.attention_mask,
                    method=type(self.model).encode_field,
                )
            )
            terms, term_weights = splade_topk_terms(impacts, self.splade_query_k)
            queries = queries.replace(terms=terms, term_weights=term_weights)
        elif engines.dense is not None:
            # live retrieval: embed queries with the CURRENT encoder (the
            # reference uses vectors cached at the last re-embedding period,
            # `realm_dataloader.py:79-89` — fresher is strictly better here).
            q_vec = jax.lax.stop_gradient(
                self.model.apply(
                    params, queries.input_ids, queries.attention_mask,
                    method=type(self.model).encode_field,
                )
            )
        batch, sampled = device_collate(
            rng, engines, corpus, queries,
            query_vectors=q_vec,
            prefetch=self.prefetch,
            n_sections=self.n_sections,
            max_pos_sections=self.max_pos_sections,
            temperature=self.temperature,
            max_support_size=self.max_support_size,
            weights=weights,
            with_lm=self.with_lm,
            in_batch_negatives=self.in_batch_negatives,
        )
        return batch, sampled

    def _loss(self, params, batch: RealmBatch):
        # mutable=["losses"] collects pre-scaled auxiliary losses sowed by
        # submodules (e.g. the MoE load-balancing loss); empty for dense models
        out, aux_vars = self.model.apply(params, batch, mode="evaluate", mutable=["losses"])
        aux = sum(jnp.sum(v) for v in jax.tree.leaves(aux_vars.get("losses", {})))
        return out.loss + aux, out

    def _value_and_grad(self, opt_params, batch, param_transform=None):
        """`((loss, out), grads)` wrt `opt_params`; `param_transform` maps them
        to full apply params (kbit dequant view; identity otherwise).
        GradCache replaces the monolithic backward when configured."""
        if self.gradcache_chunk_rows is not None:
            from .gradcache import gradcache_value_and_grad

            return gradcache_value_and_grad(
                self.model, opt_params, batch,
                chunk_rows=self.gradcache_chunk_rows,
                param_transform=param_transform,
            )

        def loss_fn(p):
            return self._loss(p if param_transform is None else param_transform(p), batch)

        return jax.value_and_grad(loss_fn, has_aux=True)(opt_params)

    def _train_step(self, params, opt_state, engines, corpus, queries, rng, weights_tuple, engine_names):
        batch, _sampled = self._collate(params, rng, engines, corpus, queries, weights_tuple, engine_names)

        from vod_tpu.models.kbit import KbitParams, kbit_materialize

        if isinstance(params, KbitParams):
            # kbit (QLoRA-style): differentiate only the trainable subset; the
            # frozen int8 base dequantizes inside the graph (fused by XLA).
            pt = lambda t: kbit_materialize(t, params.frozen, params.treedef, params.paths)
            (loss, out), grads = self._value_and_grad(params.trainable, batch, pt)
            grads = self._clip(grads)
            updates, opt_state = self.tx.update(grads, opt_state, params.trainable)
            params = params.replace(trainable=optax.apply_updates(params.trainable, updates))
        else:
            (loss, out), grads = self._value_and_grad(params, batch)
            grads = self._clip(grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, **{k: v for k, v in out.diagnostics.items()}}
        return params, opt_state, metrics, batch.section__relevance, out.retriever_scores

    def _clip(self, grads):
        if self.gradient_clip_val:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, self.gradient_clip_val / jnp.maximum(gnorm, 1e-9))
            grads = jax.tree.map(lambda g: g * scale, grads)
        return grads

    def _train_step_accum(self, params, opt_state, engines, corpus, queries_stacked, rng, weights_tuple, engine_names):
        """Gradient accumulation: lax.scan over stacked micro-batches
        (parity: `loops/train.py:76-86` `no_backward_sync` accumulation)."""
        n_micro = jax.tree.leaves(queries_stacked)[0].shape[0]
        rngs = jax.random.split(rng, n_micro)

        from vod_tpu.models.kbit import KbitParams, kbit_materialize

        is_kbit = isinstance(params, KbitParams)
        opt_params = params.trainable if is_kbit else params

        def micro(carry, inp):
            grads_acc, loss_acc = carry
            q, r = inp
            batch, _ = self._collate(params, r, engines, corpus, q, weights_tuple, engine_names)
            pt = (
                (lambda p: kbit_materialize(p, params.frozen, params.treedef, params.paths))
                if is_kbit else None
            )
            (loss, out), grads = self._value_and_grad(opt_params, batch, pt)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss), (batch.section__relevance, out.retriever_scores)

        zero_grads = jax.tree.map(jnp.zeros_like, opt_params)
        (grads, loss_sum), (rels, scores) = jax.lax.scan(
            micro, (zero_grads, 0.0), (queries_stacked, rngs)
        )
        grads = jax.tree.map(lambda g: g / n_micro, grads)
        grads = self._clip(grads)
        updates, opt_state = self.tx.update(grads, opt_state, opt_params)
        new_params = optax.apply_updates(opt_params, updates)
        params = params.replace(trainable=new_params) if is_kbit else new_params
        metrics = {"loss": loss_sum / n_micro}
        rels = rels.reshape(-1, rels.shape[-1])
        scores = scores.reshape(-1, scores.shape[-1])
        return params, opt_state, metrics, rels, scores

    def _eval_step(self, params, engines, corpus, queries, rng, weights_tuple, engine_names):
        from vod_tpu.models.kbit import full_params

        batch, _ = self._collate(params, rng, engines, corpus, queries, weights_tuple, engine_names)
        loss, out = self._loss(full_params(params), batch)
        return {"loss": loss, **out.diagnostics}, batch.section__relevance, out.retriever_scores

    # -- public ------------------------------------------------------------
    def train_step(self, params, opt_state, engines, corpus, queries, rng, weights: dict[str, float]):
        names = tuple(sorted(weights)) if weights else ()
        wt = tuple(jnp.float32(weights[n]) for n in names)
        return self._step(params, opt_state, engines, corpus, queries, rng, wt, engine_names=names)

    def train_step_accum(self, params, opt_state, engines, corpus, micro_batches, rng, weights: dict[str, float]):
        """`micro_batches`: list of QueryBatch -> stacked + scanned on device."""
        names = tuple(sorted(weights)) if weights else ()
        wt = tuple(jnp.float32(weights[n]) for n in names)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *micro_batches)
        return self._step_accum(
            params, opt_state, engines, corpus, stacked, rng, wt, engine_names=names
        )

    def eval_step(self, params, engines, corpus, queries, rng, weights: dict[str, float]):
        names = tuple(sorted(weights)) if weights else ()
        wt = tuple(jnp.float32(weights[n]) for n in names)
        return self._eval(params, engines, corpus, queries, rng, wt, engine_names=names)


def make_train_step(model, tx, **kw) -> RealmTrainStep:
    return RealmTrainStep(model, tx, **kw)


def training_loop(
    *,
    step_fn: RealmTrainStep,
    params: typ.Any,
    opt_state: typ.Any,
    engines: HybridEngines,
    corpus: DeviceCorpus,
    train_queries: typ.Iterable[QueryBatch],
    state: TrainerState,
    rng: jax.Array,
    val_queries: typ.Optional[typ.Sequence[QueryBatch]] = None,
    val_check_interval: typ.Optional[int] = None,
    log_interval: int = 50,
    metrics: typ.Sequence[str] = ("mrr", "ndcg_10", "hitrate_3"),
    on_log: typ.Optional[typ.Callable[[int, dict], None]] = None,
    on_checkpoint: typ.Optional[typ.Callable[[typ.Any, typ.Any, TrainerState], None]] = None,
    callbacks: typ.Sequence[typ.Any] = (),
    prefetch_batches: int = 2,
    until_step: typ.Optional[int] = None,
    mesh: typ.Any = None,
    dp_axis: str = "dp",
    profile_dir: typ.Optional[str] = None,
    profile_steps: tuple[int, int] = (3, 6),
) -> tuple[typ.Any, typ.Any, TrainerState, dict]:
    """One period of training (parity: `loops/train.py:21-226`).

    Runs until `until_step` (default: `state.next_period_start_step`) or the
    query iterator is exhausted. Returns (params, opt_state, state, last_metrics).

    Mesh-aware (parity: the reference's whole-training DDP/FSDP runs,
    `vod_exps/init.py:40,55`): pass `mesh` to dp-shard every incoming
    QueryBatch over `dp_axis` — with fsdp/tp-sharded params the jitted step
    then runs fully SPMD, XLA inserting the gradient psums the reference gets
    from `fabric.backward`. Monitor state stays device-resident; its reductions
    over the dp-sharded metric arrays are the psum aggregation
    (`aggregate_metrics_psum` is the shard_map-level equivalent).
    """
    from .callbacks import call_callbacks

    if mesh is not None:
        from vod_tpu.parallel import shard_batch

        _shard = lambda q: shard_batch(q, mesh, axis=dp_axis)
    else:
        _shard = lambda q: q

    until = until_step if until_step is not None else state.next_period_start_step
    call_callbacks(callbacks, "on_fit_start", params=params, state=state)
    monitor = RetrievalMonitor(list(metrics))
    last_logged: dict = {}
    t0 = time.time()
    n_done = 0
    if prefetch_batches > 0:
        # host tokenization of batch t+1 overlaps the device step t
        # (SURVEY §7 hard part #4; replaces the reference's dataloader workers)
        from vod_tpu.dataloaders.prefetch import prefetch_iterator

        train_queries = prefetch_iterator(iter(train_queries), size=prefetch_batches)
    accum = max(1, int(getattr(step_fn, "accumulate_grad_batches", 1)))
    train_iter = iter(train_queries)
    # jax.profiler trace window (SURVEY §5 "tracing": the reference has only
    # wall clocks; this captures real XLA timelines viewable in TensorBoard /
    # Perfetto). Bounds are loop-local step counts so the window lands after
    # compilation regardless of the global step.
    _prof_on = False
    _prof_n = 0
    try:
        for queries in train_iter:
            if state.step >= until or state.completed:
                break
            rng, step_rng = jax.random.split(rng)
            if profile_dir is not None:
                if _prof_n == profile_steps[0] and not _prof_on:
                    jax.profiler.start_trace(profile_dir)
                    _prof_on = True
                elif _prof_n == profile_steps[1] and _prof_on:
                    jax.profiler.stop_trace()
                    _prof_on = False
            _prof_n += 1
            weights = state.get_parameters()  # schedules -> traced scalars each step
            if accum > 1:
                # grad accumulation (parity: `loops/train.py:76-86` `no_backward_sync`):
                # gather `accum` micro-batches and scan them in ONE optimizer step.
                micro = [_shard(queries)]
                for _ in range(accum - 1):
                    nxt = next(train_iter, None)
                    if nxt is None:
                        break
                    micro.append(_shard(nxt))
                if len(micro) < accum:
                    # fixed accumulation window (parity: `loops/train.py:76-86` —
                    # pending grads at iterator exhaustion are never applied).
                    # Stacking a short tail would silently change the effective
                    # batch size AND retrace the scan at a new length. Break
                    # BEFORE on_train_batch_start so start/end callbacks pair.
                    break
                call_callbacks(callbacks, "on_train_batch_start", batch=queries, step=state.step)
                params, opt_state, m, rel, scores = step_fn.train_step_accum(
                    params, opt_state, engines, corpus, micro, step_rng, weights
                )
            else:
                call_callbacks(callbacks, "on_train_batch_start", batch=queries, step=state.step)
                params, opt_state, m, rel, scores = step_fn.train_step(
                    params, opt_state, engines, corpus, _shard(queries), step_rng, weights
                )
            monitor.update(relevances=rel, scores=scores)
            call_callbacks(callbacks, "on_train_batch_end", metrics=m, step=state.step)
            state.step += 1
            state.update_steps += 1
            n_done += 1
            if state.step % log_interval == 0 or state.step >= until:
                last_logged = {
                    **{k: float(v) for k, v in m.items()},
                    **monitor.compute(),
                    "steps_per_sec": n_done / max(time.time() - t0, 1e-6),
                    "step": state.step,
                    **{f"parameters/{k}": v for k, v in weights.items()},
                }
                if on_log:
                    on_log(state.step, last_logged)
            if (
                val_check_interval
                and val_queries is not None
                and state.step % val_check_interval == 0
            ):
                rng, val_rng = jax.random.split(rng)
                val_metrics = validation_loop(
                    step_fn=step_fn, params=params, engines=engines, corpus=corpus,
                    val_queries=val_queries, rng=val_rng, weights=state.get_parameters(),
                    metrics=metrics, mesh=mesh, dp_axis=dp_axis,
                )
                if on_log:
                    on_log(state.step, {f"val/{k}": v for k, v in val_metrics.items()})
                if on_checkpoint:
                    on_checkpoint(params, opt_state, state)
    except KeyboardInterrupt:  # parity: `loops/train.py:211` clean-exit
        pass
    finally:
        if _prof_on:  # loop ended inside the trace window
            jax.profiler.stop_trace()
    call_callbacks(callbacks, "on_fit_end", params=params, state=state)
    return params, opt_state, state, last_logged


def validation_loop(
    *,
    step_fn: RealmTrainStep,
    params: typ.Any,
    engines: HybridEngines,
    corpus: DeviceCorpus,
    val_queries: typ.Sequence[QueryBatch],
    rng: jax.Array,
    weights: dict[str, float],
    metrics: typ.Sequence[str] = ("mrr", "ndcg_10", "hitrate_3"),
    mesh: typ.Any = None,
    dp_axis: str = "dp",
) -> dict[str, float]:
    """No-grad eval over the validation queries (parity: `loops/val.py:14`)."""
    if mesh is not None:
        from vod_tpu.parallel import shard_batch
    monitor = RetrievalMonitor(list(metrics))
    losses = []
    for queries in val_queries:
        rng, r = jax.random.split(rng)
        if mesh is not None:
            queries = shard_batch(queries, mesh, axis=dp_axis)
        m, rel, scores = step_fn.eval_step(params, engines, corpus, queries, r, weights)
        monitor.update(relevances=rel, scores=scores)
        losses.append(float(m["loss"]))
    out = monitor.compute()
    out["loss"] = float(np.mean(losses)) if losses else float("nan")
    return out
