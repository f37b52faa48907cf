"""Operating-point autotuning for the device search engines.

Parity: faiss `ParameterSpace` / `OperatingPoints` autotuning
(`faiss/AutoTune.h`) — the reference pins its knobs in hydra factory strings
(`vod_exps/hydra/datasets/search_defaults/faiss/default.yaml`) and leaves
tuning to the user; this module closes that loop on-device. Given a built
index, a query sample, and exact ground truth, it sweeps the RUNTIME knobs
(the ones that do not require a rebuild), measures recall@k — and optionally
wall time — per setting, prunes to the Pareto frontier, and picks the cheapest
setting meeting a recall target.

Runtime knobs per engine:
  * `IVFPQIndex` — `nprobe` (the per-probe window budget `max_windows` is
    rescaled from the index's built nprobe→budget ratio, capped at the total
    window count so probing every cell stays exact); with an IndexRefine
    rerank store, also `k_factor` (the pooled-candidate width) crossed with
    nprobe
  * `IVFIndex`  — `nprobe`
  * `PQIndex`   — `k_factor` (refine pool width) and, in coarse mode,
    `n_candidates`; the direct serving codec (keep_codes=False) additionally
    sweeps the fused Pallas coarse kernel (`fused`/`fused_bins`/`fused_tile` —
    measured ~2x the scan at B=64 on 8.8M, slightly lower recall)
  * flat `DenseIndex` / `SparseIndex` — nothing to tune (single point)

All knobs are static pytree metadata, so each setting is a recompile — sweeps
are meant for offline tuning (periodic reindex time), not the hot path.
Timing follows the honest-relay method (distinct pre-staged inputs, fetch
forced, min over repeats); pass `measure_time=False` for deterministic
recall-only tuning (e.g. in tests or when the QPS ordering is known to be
monotone in the knob, as it is for nprobe/k_factor).
"""

from __future__ import annotations

import dataclasses
import time
import typing as typ

import jax
import jax.numpy as jnp
import numpy as np

from .base import SearchQueries
from .dense import DenseIndex, IVFIndex, PQIndex, dense_search, ivf_search, pq_search
from .ivfpq import IVFPQIndex, ivfpq_search
from .sharded import (
    ShardedDenseIndex,
    ShardedIVFIndex,
    ShardedIVFPQIndex,
    ShardedPQIndex,
    sharded_dense_search,
    sharded_ivf_search,
    sharded_ivfpq_search,
    sharded_pq_search,
)


@dataclasses.dataclass(frozen=True)
class OperatingPoint:
    """One measured (params, recall, speed) setting (faiss `OperatingPoint`)."""

    params: dict[str, int]
    recall: float
    wall_s: typ.Optional[float] = None  # per evaluated query batch; None if untimed

    @property
    def qps(self) -> typ.Optional[float]:
        return None if not self.wall_s else round(self._n_queries / self.wall_s, 1)

    _n_queries: int = 0


def _recall_at_k(got: np.ndarray, gt: np.ndarray, k: int) -> float:
    got, gt = got[:, :k], gt[:, :k]
    return float(
        np.mean([len(set(got[i][got[i] >= 0].tolist()) & set(gt[i].tolist())) / k
                 for i in range(got.shape[0])])
    )


def apply_runtime_params(index: typ.Any, params: dict[str, int]) -> typ.Any:
    """Return a view of `index` with the runtime knobs in `params` applied
    (no data movement — static metadata replace only)."""
    if not params:
        return index
    if isinstance(index, IVFPQIndex):
        nprobe = int(params["nprobe"])
        # rescale the per-probe window budget from the built ratio; cap at the
        # total window count so nprobe == n_cells degenerates to exact search
        per_probe = index.max_windows / max(index.nprobe, 1)
        total_windows = int(jnp.sum(index.win_count))
        mw = int(min(total_windows, max(1, round(per_probe * nprobe))))
        kw = {"nprobe": nprobe, "max_windows": mw}
        if "k_factor" in params:  # IndexRefine pool width (rerank store only)
            kw["k_factor"] = int(params["k_factor"])
        return index.replace(**kw)
    if isinstance(index, (IVFIndex, ShardedIVFIndex)):
        return index.replace(nprobe=int(params["nprobe"]))
    if isinstance(index, ShardedIVFPQIndex):
        nprobe = int(params["nprobe"])
        kw = {"nprobe": nprobe}
        if "k_factor" in params:
            kw["k_factor"] = int(params["k_factor"])
        if index.max_windows <= 0:
            return index.replace(**kw)  # untruncated stays untruncated
        per_probe = index.max_windows / max(index.nprobe, 1)
        # cap at the busiest shard's local window count (win_count is [S*C]
        # with zeros for non-local cells)
        n_shards = index.mesh.shape[index.axis]
        per_shard = np.asarray(index.win_count).reshape(n_shards, -1).sum(axis=1)
        cap = int(per_shard.max())
        mw = int(min(cap, max(1, round(per_probe * nprobe))))
        return index.replace(**kw, max_windows=mw)
    if isinstance(index, (PQIndex, ShardedPQIndex)):
        kw = {}
        if "k_factor" in params:
            kw["k_factor"] = int(params["k_factor"])
        if "n_candidates" in params:
            if index.coarse_codes is None:
                raise ValueError("n_candidates only applies to coarse-mode PQ indexes")
            kw["n_candidates"] = int(params["n_candidates"])
        # serving-kernel knobs (static metadata like the rest): fused=1 routes
        # the coarse stage through the Pallas matmul+binned-top-k kernel
        if "fused" in params:
            kw["kernel"] = "fused" if params["fused"] else "scan"
        if "fused_bins" in params:
            kw["fused_bins"] = int(params["fused_bins"])
        if "fused_tile" in params:
            kw["fused_tile"] = int(params["fused_tile"])
        return index.replace(**kw)
    raise TypeError(f"no runtime knobs for {type(index).__name__}")


def default_grid(index: typ.Any) -> list[dict[str, int]]:
    """The faiss-`ParameterSpace`-shaped default sweep for this engine."""
    if isinstance(index, (IVFPQIndex, IVFIndex, ShardedIVFIndex, ShardedIVFPQIndex)):
        c = int(index.centroids.shape[0])
        probes = [{"nprobe": p} for p in (1, 2, 4, 8, 16, 32, 64, 128, 256) if p <= c]
        if getattr(index, "rerank_codes", None) is not None:
            # IndexRefine pool width crossed with nprobe — the rerank gather
            # is ~free, so wider pools cost only the window-stage top-k
            return [{**p, "k_factor": f} for p in probes for f in (4, 16, 32)]
        return probes
    if isinstance(index, (PQIndex, ShardedPQIndex)):
        ks: list[dict[str, int]] = (
            [{"k_factor": f} for f in (1, 2, 4, 8, 16, 32)]
            if index.refine_codes is not None else [{}]
        )
        # n_candidates only gates the ADC stage; in coarse→refine direct mode
        # (codes=None) the pool is k_factor*k straight from the coarse scan
        if index.coarse_codes is not None and index.codes is not None:
            n = int(index.coarse_codes.shape[0])
            cands = [c for c in (256, 1024, 4096, 16384) if c <= n]
            ks = [{**k, "n_candidates": c} for k in ks for c in cands]
        elif index.coarse_codes is not None and index.refine_codes is not None:
            # direct serving codec: also sweep the fused coarse kernel at the
            # measured-roofline shape (bins=2048, tile=16384 — ~2x the scan at
            # B=64 on 8.8M x 128 int8; falls back to the scan path on corpora
            # the tile doesn't divide, where its point just duplicates scan's).
            # Kernel choice is the one knob NOT cost-monotone in recall (fused
            # is faster AND slightly lower recall), so timed sweeps pick it on
            # wall; untimed sweeps pick it as the lowest-recall point meeting
            # the target — both land on fused when it holds the target.
            ks = ks + [
                {**k, "fused": 1, "fused_bins": 2048, "fused_tile": 16384}
                for k in ks if k.get("k_factor", 1) >= 8
            ]
        return ks
    return [{}]  # flat / anything else: a single operating point


def _search_fn(index: typ.Any) -> typ.Callable[[typ.Any, jax.Array, int], jax.Array]:
    if isinstance(index, IVFPQIndex):
        return lambda ix, q, k: ivfpq_search(ix, SearchQueries(vector=q), k).indices
    if isinstance(index, IVFIndex):
        return lambda ix, q, k: ivf_search(ix, SearchQueries(vector=q), k).indices
    if isinstance(index, PQIndex):
        return lambda ix, q, k: pq_search(ix, SearchQueries(vector=q), k).indices
    if isinstance(index, DenseIndex):
        return lambda ix, q, k: dense_search(ix, SearchQueries(vector=q), k).indices
    if isinstance(index, ShardedIVFPQIndex):
        return lambda ix, q, k: sharded_ivfpq_search(ix, SearchQueries(vector=q), k).indices
    if isinstance(index, ShardedIVFIndex):
        return lambda ix, q, k: sharded_ivf_search(ix, SearchQueries(vector=q), k).indices
    if isinstance(index, ShardedPQIndex):
        return lambda ix, q, k: sharded_pq_search(ix, SearchQueries(vector=q), k).indices
    if isinstance(index, ShardedDenseIndex):
        return lambda ix, q, k: sharded_dense_search(ix, SearchQueries(vector=q), k).indices
    raise TypeError(f"unsupported index type {type(index).__name__}")


def sweep_operating_points(
    index: typ.Any,
    queries: jax.Array,
    gt_indices: np.ndarray,
    *,
    top_k: int = 10,
    grid: typ.Optional[typ.Sequence[dict[str, int]]] = None,
    measure_time: bool = True,
    time_repeats: int = 3,
) -> list[OperatingPoint]:
    """Measure every grid setting; returns points sorted by ascending recall.

    `gt_indices`: [B, >=top_k] exact ids (compute once with a flat f32 scan).
    """
    grid = list(grid) if grid is not None else default_grid(index)
    fn = _search_fn(index)
    b = int(queries.shape[0])
    points: list[OperatingPoint] = []
    # the index rides as a jit ARGUMENT (never close over big device arrays —
    # the knobs being static metadata still trigger one compile per setting)
    jitted = jax.jit(lambda ix, q: fn(ix, q, top_k))
    for params in grid:
        ix = apply_runtime_params(index, params)
        got = np.asarray(jitted(ix, queries))  # also the warmup for the timed reps
        recall = _recall_at_k(got, np.asarray(gt_indices), top_k)
        wall = None
        if measure_time:
            wall = float("inf")
            for r in range(time_repeats):
                # distinct inputs per rep (relay dedups identical dispatches)
                qr = queries + jnp.float32(1e-6 * (r + 1))
                t0 = time.time()
                np.asarray(jitted(ix, qr)[-1, -1])
                wall = min(wall, time.time() - t0)
        points.append(
            OperatingPoint(params=dict(params), recall=recall, wall_s=wall, _n_queries=b)
        )
    return sorted(points, key=lambda p: (p.recall, -(p.wall_s or 0.0)))


def pareto_front(points: typ.Sequence[OperatingPoint]) -> list[OperatingPoint]:
    """Keep points not dominated in (recall up, wall_s down) — faiss
    `OperatingPoints::optimal`. Untimed points (wall_s=None) always survive:
    their speed is unknown, so nothing can dominate them on that axis."""
    out: list[OperatingPoint] = []
    best_wall = float("inf")
    # descending recall: a timed point survives iff it is strictly faster
    # than every point with >= its recall
    for p in sorted(points, key=lambda p: -p.recall):
        if p.wall_s is None:
            out.append(p)
            continue
        if p.wall_s < best_wall:
            out.append(p)
            best_wall = p.wall_s
    return sorted(out, key=lambda p: p.recall)


def select_operating_point(
    points: typ.Sequence[OperatingPoint],
    target_recall: float,
) -> OperatingPoint:
    """Cheapest point meeting `target_recall`; the best-recall point if none
    does (with its shortfall visible to the caller via `.recall`).

    For untimed points (measure_time=False sweeps) the lowest recall meeting
    the target is the cost proxy — every runtime knob here (nprobe, k_factor,
    n_candidates) has cost monotone in recall."""
    meeting = [p for p in points if p.recall >= target_recall]
    if not meeting:
        return max(points, key=lambda p: p.recall)
    timed = [p for p in meeting if p.wall_s is not None]
    if timed:
        return min(timed, key=lambda p: (p.wall_s, p.recall))
    return min(meeting, key=lambda p: p.recall)


def _exact_topk_host(emb: np.ndarray, q: np.ndarray, k: int, chunk: int = 1_000_000) -> np.ndarray:
    """Exact top-k ids by blocked host matmul (GT for the slab build path,
    where the full [N, H] matrix lives in host RAM, not HBM)."""
    nq, n = q.shape[0], emb.shape[0]
    qf = q.astype(np.float32)
    best_s = np.full((nq, k), -np.inf, np.float32)
    best_i = np.full((nq, k), -1, np.int64)
    for start in range(0, n, chunk):
        s = qf @ emb[start : start + chunk].astype(np.float32).T
        ck = min(k, s.shape[1])
        part = np.argpartition(-s, ck - 1, axis=1)[:, :ck]
        all_s = np.concatenate([best_s, np.take_along_axis(s, part, 1)], axis=1)
        all_i = np.concatenate([best_i, part.astype(np.int64) + start], axis=1)
        order = np.argsort(-all_s, axis=1, kind="stable")[:, :k]
        best_s = np.take_along_axis(all_s, order, 1)
        best_i = np.take_along_axis(all_i, order, 1)
    return best_i


def autotune_after_build(
    index: typ.Any,
    fcfg: typ.Any,
    emb: typ.Union[jax.Array, np.ndarray],
    *,
    rng: jax.Array,
) -> tuple[typ.Any, typ.Optional[dict]]:
    """Config-driven tuning right after a periodic rebuild
    (`DenseFactoryConfig.autotune_*` — the closed loop faiss leaves to the
    user and the reference never runs).

    `emb` is the corpus embedding matrix the index was just built from — a
    device array (in-HBM path) or host np.ndarray (slab path). Queries are a
    sample of corpus rows; ground truth is the exact f32 scan (on device or
    blocked on host, matching where `emb` lives). Returns
    `(tuned_index, info | None)`; None = the engine has no runtime knobs
    (flat / sparse / lookup).
    """
    if getattr(fcfg, "autotune_target_recall", None) is None:
        return index, None
    tunable = (
        PQIndex, IVFIndex, IVFPQIndex,
        ShardedPQIndex, ShardedIVFIndex, ShardedIVFPQIndex,
    )
    if not isinstance(index, tunable):
        return index, None
    n = int(emb.shape[0])
    nq = min(int(fcfg.autotune_queries), n)
    k = min(int(fcfg.autotune_top_k), n)
    seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
    sel = np.random.default_rng(seed).choice(n, size=nq, replace=False)
    if isinstance(emb, np.ndarray):
        q_np = emb[sel]
        gt = _exact_topk_host(emb, q_np, k)
        queries = jnp.asarray(q_np, dtype=jnp.float32)
    else:
        from .dense import build_dense_index

        queries = emb[jnp.asarray(sel)].astype(jnp.float32)
        flat = build_dense_index(emb, dtype="float32", approx_recall=None)
        gt = np.asarray(dense_search(flat, SearchQueries(vector=queries), k).indices)
        del flat
    tuned, chosen, front = autotune(
        index,
        queries,
        gt,
        target_recall=float(fcfg.autotune_target_recall),
        top_k=k,
        measure_time=bool(fcfg.autotune_measure_time),
    )
    info = {
        "params": dict(chosen.params),
        "recall": round(chosen.recall, 4),
        "target": float(fcfg.autotune_target_recall),
        "met": bool(chosen.recall >= float(fcfg.autotune_target_recall)),
        "front": [
            {"params": dict(p.params), "recall": round(p.recall, 4),
             **({"qps": p.qps} if p.qps is not None else {})}
            for p in front
        ],
    }
    return tuned, info


def autotune(
    index: typ.Any,
    queries: jax.Array,
    gt_indices: np.ndarray,
    *,
    target_recall: float = 0.95,
    top_k: int = 10,
    grid: typ.Optional[typ.Sequence[dict[str, int]]] = None,
    measure_time: bool = True,
) -> tuple[typ.Any, OperatingPoint, list[OperatingPoint]]:
    """One-call tuning: sweep → Pareto → select → apply.

    Returns `(tuned_index, chosen_point, pareto_points)`. The tuned index is
    `index` with the chosen runtime knobs applied (same device buffers).
    """
    points = sweep_operating_points(
        index, queries, gt_indices, top_k=top_k, grid=grid, measure_time=measure_time
    )
    front = pareto_front(points)
    chosen = select_operating_point(front, target_recall)
    return apply_runtime_params(index, chosen.params), chosen, front
