"""Retrieval metrics as jitted kernels + a distributed-mean monitor.

Parity: reference `src/vod_models/monitoring/` — torch.jit kernels for
mrr/hitrate/precision/recall/kldiv/min/max/entropy/ndcg (`functional.py:41-161`),
`RetrievalMonitor` parsing `metric_topk` names (`monitor.py:108`), and a
`MeanAggregator` with cross-rank all_reduce (`aggregator.py:56-59`) — here an
optional `psum` over a mesh axis.
"""

from __future__ import annotations

import re
import typing as typ

import jax
import jax.numpy as jnp

from vod_tpu.ops.numpy_ops import masked_log_softmax


def _rank_inputs(relevances: jax.Array, scores: jax.Array, topk: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mask NaN/+inf, sort by descending score, truncate (parity:
    `_mask_rank_inputs` + `prepare_for_metric_computation`, `functional.py:15-26,164-180`)."""
    n_positives = jnp.sum(relevances > 0, axis=-1).astype(jnp.float32)
    bad = jnp.isnan(scores) | (jnp.isinf(scores) & (scores > 0))
    scores = jnp.where(bad, -jnp.inf, scores)
    relevances = jnp.where(bad, 0, relevances)
    order = jnp.argsort(-scores, axis=-1, stable=True)
    rr = jnp.take_along_axis(relevances, order, axis=-1)
    rs = jnp.take_along_axis(scores, order, axis=-1)
    if topk > 0:
        rr, rs = rr[..., :topk], rs[..., :topk]
    return rr, rs, n_positives


def _mrr(rr, rs, n_pos):
    k = rr.shape[-1]
    ids = jnp.arange(k)
    first = jnp.argmin(jnp.where(rr > 0, ids, k), axis=-1)
    hit = jnp.any(rr > 0, axis=-1)
    return jnp.where(hit, 1.0 / (1.0 + first), 0.0)


def _hitrate(rr, rs, n_pos):
    return jnp.any(rr > 0, axis=-1).astype(jnp.float32)


def _precision(rr, rs, n_pos):
    n_rel = jnp.sum(rr > 0, axis=-1)
    n_ret = jnp.sum(jnp.isfinite(rs), axis=-1)
    return n_rel / jnp.maximum(n_ret, 1)


def _recall(rr, rs, n_pos):
    n_rel = jnp.sum(rr > 0, axis=-1).astype(jnp.float32)
    return jnp.where(n_pos > 0, n_rel / jnp.maximum(n_pos, 1.0), jnp.nan)


def _kldiv(rr, rs, n_pos):
    data_scores = jnp.where(rr > 0, 0.0, -jnp.inf)
    data_lp = masked_log_softmax(data_scores)
    model_lp = masked_log_softmax(jnp.where(jnp.isfinite(rs), rs, -jnp.inf))
    terms = jnp.where(
        jnp.isfinite(data_lp) & jnp.isfinite(model_lp), jnp.exp(data_lp) * (data_lp - model_lp), 0.0
    )
    kl = jnp.sum(terms, axis=-1)
    row_pos = jnp.sum(rr > 0, axis=-1)
    return jnp.where(row_pos > 0, kl, jnp.nan)


def _min(rr, rs, n_pos):
    return jnp.min(jnp.where(jnp.isfinite(rs), rs, jnp.inf), axis=-1)


def _max(rr, rs, n_pos):
    return jnp.max(jnp.where(jnp.isfinite(rs), rs, -jnp.inf), axis=-1)


def _entropy(rr, rs, n_pos):
    lp = masked_log_softmax(jnp.where(jnp.isfinite(rs), rs, -jnp.inf))
    terms = jnp.where(jnp.isfinite(rs), -jnp.exp(lp) * lp, 0.0)
    return jnp.sum(terms, axis=-1)


def _ndcg(rr, rs, n_pos):
    rr = rr.astype(jnp.float32)
    k = rr.shape[-1]
    log2_ranks = jnp.log2(jnp.arange(2, k + 2).astype(jnp.float32))
    dcg = jnp.sum(rr / log2_ranks, axis=-1)
    ideal = -jnp.sort(-rr, axis=-1)
    idcg = jnp.sum(ideal / log2_ranks, axis=-1)
    return jnp.where(idcg > 0, dcg / idcg, 0.0)


_METRICS: dict[str, typ.Callable] = {
    "mrr": _mrr,
    "hitrate": _hitrate,
    "precision": _precision,
    "recall": _recall,
    "kldiv": _kldiv,
    "min": _min,
    "max": _max,
    "entropy": _entropy,
    "ndcg": _ndcg,
}

_NAME_RE = re.compile(r"^(?P<name>[a-z_]+?)(?:_(?P<topk>\d+))?$")


def parse_metric_name(name: str) -> tuple[str, int]:
    """`'ndcg_10' -> ('ndcg', 10)`; no suffix -> topk=0 (all)."""
    m = _NAME_RE.match(name)
    if m is None or m.group("name") not in _METRICS:
        raise ValueError(f"Unknown metric: {name!r} (known: {sorted(_METRICS)})")
    return m.group("name"), int(m.group("topk") or 0)


def retrieval_metrics(
    metrics: typ.Sequence[str],
    *,
    relevances: jax.Array,  # [B, D]
    scores: jax.Array,  # [B, D]
) -> dict[str, jax.Array]:
    """Per-row metric values (NaN = undefined row). jit-friendly."""
    out = {}
    for name in metrics:
        base, topk = parse_metric_name(name)
        rr, rs, n_pos = _rank_inputs(relevances, scores, topk)
        out[name] = _METRICS[base](rr, rs, n_pos)
    return out


def aggregate_metrics_psum(
    values: dict[str, jax.Array], axis_name: str
) -> dict[str, jax.Array]:
    """NaN-aware distributed mean over a mesh axis (parity: `MeanAggregator`
    all_reduce sync, `aggregator.py:56-59`). Call inside pmap/shard_map."""
    out = {}
    for name, v in values.items():
        ok = ~jnp.isnan(v)
        s = jax.lax.psum(jnp.sum(jnp.where(ok, v, 0.0)), axis_name)
        c = jax.lax.psum(jnp.sum(ok.astype(jnp.float32)), axis_name)
        out[name] = s / jnp.maximum(c, 1.0)
    return out


class RetrievalMonitor:
    """Streaming NaN-aware mean aggregator over batches.

    Parity: `RetrievalMonitor` + `MeanAggregator` (`monitor.py:73`,
    `aggregator.py`). State lives ON DEVICE — `update` enqueues one jitted
    accumulation (no host sync, unlike the reference's per-step `.item()`
    pulls); only `compute()` transfers, so the train loop's dispatch is never
    blocked between log intervals.
    """

    def __init__(self, metrics: typ.Sequence[str]):
        self.metrics = list(metrics)
        for m in self.metrics:
            parse_metric_name(m)
        self._update_jit = jax.jit(self._update_fn, donate_argnums=(0,))
        self.reset()

    def reset(self) -> None:
        self._state: typ.Optional[dict[str, tuple[jax.Array, jax.Array]]] = None

    def _update_fn(self, state, relevances, scores):
        vals = retrieval_metrics(self.metrics, relevances=relevances, scores=scores)
        out = {}
        for m, v in vals.items():
            ok = ~jnp.isnan(v)
            s = jnp.sum(jnp.where(ok, v, 0.0))
            c = jnp.sum(ok.astype(jnp.float32))
            prev_s, prev_c = state[m]
            out[m] = (prev_s + s, prev_c + c)
        return out

    def update(self, *, relevances: jax.Array, scores: jax.Array) -> None:
        if self._state is None:
            self._state = {
                m: (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
                for m in self.metrics
            }
        self._state = self._update_jit(self._state, relevances, scores)

    def compute(self) -> dict[str, float]:
        if self._state is None:
            return {m: float("nan") for m in self.metrics}
        host = jax.device_get(self._state)  # the ONLY host sync
        return {
            m: (float(s) / float(c)) if c > 0 else float("nan")
            for m, (s, c) in host.items()
        }
