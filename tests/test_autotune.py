"""Autotune: operating-point sweeps over runtime knobs.

Parity: faiss `ParameterSpace`/`OperatingPoints` (`faiss/AutoTune.h`) — the
reference pins knobs in hydra factory strings and never tunes; `autotune`
sweeps nprobe/k_factor/n_candidates on a BUILT index (static-metadata replace,
no data movement), prunes to the Pareto frontier, and picks the cheapest
setting meeting a recall target. Recall-only mode (`measure_time=False`) is
deterministic for CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vod_tpu.search import (
    SearchQueries,
    apply_runtime_params,
    autotune,
    build_dense_index,
    build_ivfpq_index,
    build_pq_index,
    ivfpq_search,
    pareto_front,
    select_operating_point,
    sweep_operating_points,
)
from vod_tpu.search.autotune import OperatingPoint, default_grid


def _corpus(n=4096, d=64, seed=0):
    r = np.random.default_rng(seed)
    centers = r.standard_normal((32, d), dtype=np.float32) * 2
    x = centers[r.integers(0, 32, n)] + r.standard_normal((n, d), dtype=np.float32)
    return jnp.asarray(x.astype(np.float32))


def _queries_and_gt(x, b=32, k=10, seed=1):
    r = np.random.default_rng(seed)
    ids = r.integers(0, x.shape[0], b)
    q = np.asarray(x)[ids] + 0.1 * r.standard_normal((b, x.shape[1]), dtype=np.float32)
    qd = jnp.asarray(q)
    gt = np.asarray(jax.lax.top_k(qd @ x.T, k)[1])
    return qd, gt


def test_sweep_recall_monotone_in_nprobe_and_full_probe_exact():
    x = _corpus()
    q, gt = _queries_and_gt(x)
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=32, nprobe=8, window=256,
        n_subquantizers=8, kmeans_iters=4, refine="float32", approx_recall=None,
    )
    grid = [{"nprobe": p} for p in (1, 4, 32)]
    pts = sweep_operating_points(ivf, q, gt, top_k=10, grid=grid, measure_time=False)
    by_nprobe = {p.params["nprobe"]: p.recall for p in pts}
    assert by_nprobe[1] <= by_nprobe[4] <= by_nprobe[32]
    # probing every cell with the full-window budget is exact (refine=f32)
    assert by_nprobe[32] == 1.0


def test_apply_runtime_params_rescales_window_budget():
    x = _corpus(n=2048)
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=16, nprobe=4, window=256,
        n_subquantizers=8, kmeans_iters=4, refine="float32", approx_recall=None,
    )
    per_probe = ivf.max_windows / ivf.nprobe
    up = apply_runtime_params(ivf, {"nprobe": 16})
    assert up.nprobe == 16
    total = int(jnp.sum(ivf.win_count))
    assert up.max_windows == min(total, round(per_probe * 16))
    # same buffers — a view, not a rebuild
    assert up.refine_codes is ivf.refine_codes and up.row_ids is ivf.row_ids


def test_pq_k_factor_sweep_and_selection():
    x = _corpus(n=2048)
    q, gt = _queries_and_gt(x)
    pq = build_pq_index(
        jax.random.PRNGKey(0), x, n_subquantizers=8, coarse_dim=None,
        refine="float32", approx_recall=None,
    )
    pts = sweep_operating_points(
        pq, q, gt, top_k=10,
        grid=[{"k_factor": f} for f in (1, 4, 16)], measure_time=False,
    )
    by_kf = {p.params["k_factor"]: p.recall for p in pts}
    assert by_kf[1] <= by_kf[4] <= by_kf[16]
    # untimed selection: the SMALLEST k_factor meeting the target (ties on
    # wall_s=None rank by recall, so min() picks the lowest-recall qualifier)
    chosen = select_operating_point(pts, target_recall=by_kf[4])
    assert chosen.params["k_factor"] in (1, 4)
    assert chosen.recall >= by_kf[4]


def test_pareto_front_drops_dominated_points():
    mk = lambda r, w: OperatingPoint(params={}, recall=r, wall_s=w, _n_queries=10)
    pts = [mk(0.5, 1.0), mk(0.8, 2.0), mk(0.7, 3.0), mk(0.9, 5.0)]
    front = pareto_front(pts)
    assert [(p.recall, p.wall_s) for p in front] == [(0.5, 1.0), (0.8, 2.0), (0.9, 5.0)]
    # qps derives from the timed wall
    assert front[0].qps == 10.0


def test_untimed_front_keeps_all_points_and_selects_cheapest_proxy():
    """Regression: untimed sweeps (measure_time=False, the default) used to
    collapse the Pareto front to the single highest-recall point (wall=None
    ranked as 0.0), so autotune applied the most expensive knob setting. The
    cheapest untimed point meeting the target is the LOWEST-recall qualifier
    (knob cost is monotone in recall for nprobe/k_factor grids)."""
    mk = lambda n, r: OperatingPoint(params={"nprobe": n}, recall=r, wall_s=None)
    pts = [mk(1, 0.7), mk(2, 0.91), mk(4, 0.98), mk(8, 1.0)]
    front = pareto_front(pts)
    assert len(front) == 4  # nothing dominated: speed axis is unknown
    chosen = select_operating_point(front, target_recall=0.9)
    assert chosen.params["nprobe"] == 2
    # mixed timed/untimed: timed qualifiers win on real wall
    mixed = pts + [OperatingPoint(params={"nprobe": 3}, recall=0.95, wall_s=0.5)]
    assert select_operating_point(mixed, 0.9).params["nprobe"] == 3


def test_select_falls_back_to_best_recall_when_unreachable():
    mk = lambda r, w: OperatingPoint(params={"nprobe": int(10 * r)}, recall=r, wall_s=w)
    pts = [mk(0.5, 1.0), mk(0.8, 2.0)]
    assert select_operating_point(pts, target_recall=0.99).recall == 0.8
    # cheapest qualifying point, not the best one
    assert select_operating_point(pts, target_recall=0.4).recall == 0.5


def test_autotune_end_to_end_returns_tuned_index():
    x = _corpus()
    q, gt = _queries_and_gt(x)
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=32, nprobe=1, window=256,
        n_subquantizers=8, kmeans_iters=4, refine="float32", approx_recall=None,
    )
    tuned, chosen, front = autotune(
        ivf, q, gt, target_recall=0.9, top_k=10,
        grid=[{"nprobe": p} for p in (1, 2, 8, 32)], measure_time=False,
    )
    assert tuned.nprobe == chosen.params["nprobe"]
    assert chosen.recall >= 0.9
    # the tuned view really searches at the chosen setting
    out = jax.jit(lambda ix, v: ivfpq_search(ix, SearchQueries(vector=v), 10))(tuned, q)
    got = np.asarray(out.indices)
    rec = np.mean([len(set(got[i]) & set(gt[i])) / 10 for i in range(got.shape[0])])
    assert rec == pytest.approx(chosen.recall, abs=1e-6)
    assert all(front[i].recall <= front[i + 1].recall for i in range(len(front) - 1))


def test_autotune_after_build_device_and_host_paths():
    """Config-driven post-build tuning (`DenseFactoryConfig.autotune_*`):
    device-array and host-slab embedding sources agree; flat is a no-op."""
    from vod_tpu.configs.search import DenseFactoryConfig
    from vod_tpu.search import autotune_after_build

    x = _corpus()
    fcfg = DenseFactoryConfig(
        codec="ivfpq", autotune_target_recall=0.9, autotune_queries=32,
        autotune_top_k=10,
    )
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=32, nprobe=1, window=256,
        n_subquantizers=8, kmeans_iters=4, refine="float32", approx_recall=None,
    )
    tuned, info = autotune_after_build(ivf, fcfg, x, rng=jax.random.PRNGKey(1))
    assert info is not None and info["met"] and info["recall"] >= 0.9
    assert tuned.nprobe == info["params"]["nprobe"] and tuned.nprobe > 1
    assert info["front"] and all("recall" in p for p in info["front"])
    # host-slab source: same corpus as np.ndarray, blocked-host GT
    tuned_h, info_h = autotune_after_build(
        ivf, fcfg, np.asarray(x), rng=jax.random.PRNGKey(1)
    )
    assert tuned_h.nprobe == tuned.nprobe
    assert info_h["recall"] == pytest.approx(info["recall"], abs=1e-6)
    # flat engine: no runtime knobs -> untouched
    flat = build_dense_index(x, dtype="float32")
    same, none = autotune_after_build(flat, fcfg, x, rng=jax.random.PRNGKey(1))
    assert none is None and same is flat
    # target=None -> off
    off = DenseFactoryConfig(codec="ivfpq")
    same2, none2 = autotune_after_build(ivf, off, x, rng=jax.random.PRNGKey(1))
    assert none2 is None and same2 is ivf


@pytest.mark.slow
def test_autotune_sharded_ivfpq_matches_unsharded_choice():
    """The sharded engines expose the same runtime knobs: tuning the cell-
    sharded IVF-PQ picks an nprobe meeting the target, and the tuned sharded
    view searches at that setting (virtual CPU mesh)."""
    from vod_tpu.configs.search import DenseFactoryConfig
    from vod_tpu.parallel import make_mesh
    from vod_tpu.search import autotune_after_build
    from vod_tpu.search.sharded import shard_ivfpq_index, sharded_ivfpq_search

    x = _corpus()
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=32, nprobe=1, window=256,
        n_subquantizers=8, kmeans_iters=4, refine="float32", approx_recall=None,
    )
    mesh = make_mesh((4,), ("shard",))
    sharded = shard_ivfpq_index(ivf, mesh)
    fcfg = DenseFactoryConfig(
        codec="ivfpq", sharded=True, autotune_target_recall=0.9,
        autotune_queries=32, autotune_top_k=10,
    )
    tuned, info = autotune_after_build(sharded, fcfg, x, rng=jax.random.PRNGKey(1))
    assert info is not None and info["met"] and info["recall"] >= 0.9
    assert tuned.nprobe == info["params"]["nprobe"] and tuned.nprobe > 1
    # the tuned sharded view really searches at the chosen recall
    q, gt = _queries_and_gt(x)
    got = np.asarray(
        sharded_ivfpq_search(tuned, SearchQueries(vector=q), 10).indices
    )
    rec = np.mean([len(set(got[i]) & set(gt[i])) / 10 for i in range(got.shape[0])])
    assert rec >= 0.85


def test_exact_topk_host_matches_device():
    from vod_tpu.search.autotune import _exact_topk_host

    x = _corpus(n=1500, d=32)
    q, gt = _queries_and_gt(x, b=16, k=10)
    got = _exact_topk_host(np.asarray(x), np.asarray(q), 10, chunk=400)
    # same score ties can permute within the tail; compare as sets per row
    for i in range(got.shape[0]):
        assert set(got[i].tolist()) == set(gt[i].tolist())


@pytest.mark.slow
def test_periodic_training_autotunes_each_period(monkeypatch) -> None:
    """`search_defaults.dense.autotune_target_recall` closes the loop from the
    experiment config: every periodic rebuild re-tunes the runtime knobs and
    the period summary records the chosen operating point."""
    from tests.helpers import tiny_tokenizer
    from tests.test_exps import _toy_data
    from vod_tpu.exps.cli import run_experiment
    from vod_tpu.exps.structconf import Experiment

    tok = tiny_tokenizer()
    sections, queries = _toy_data(n_sections=24, n_queries=24)
    exp = Experiment.parse({
        "model": {
            "kind": "ranker", "gradients": "retrieval",
            "vocab_size": tok.vocab_size, "hidden_size": 32, "num_layers": 1,
            "num_heads": 2, "intermediate_size": 64,
        },
        "tokenizer": {"max_length": 16},
        "collate": {"prefetch_n_sections": 8, "n_sections": 2, "max_pos_sections": 1},
        "dataloader": {"batch_size": 4},
        "search_defaults": {
            "dense": {"codec": "pq", "n_subquantizers": 4, "coarse_dim": None,
                      "refine": "float32", "kmeans_iters": 2,
                      "autotune_target_recall": 0.8, "autotune_queries": 16,
                      "autotune_top_k": 4},
        },
        "trainer": {"max_steps": 4, "period": 2, "log_interval": 1},
    })
    out = run_experiment(exp, sections=sections, queries=queries, tokenizer=tok)
    assert out["state"].step == 4
    tunes = [h["autotune"] for h in out["history"] if "autotune" in h]
    assert len(tunes) == 2  # one per period rebuild
    assert all("k_factor" in t["params"] for t in tunes)


def test_direct_codec_grid_sweeps_fused_kernel():
    """The serving codec's grid includes fused-coarse-kernel points; applying
    one sets the kernel knobs; the sweep measures them like any other point."""
    x = _corpus(n=3000)  # pads to 3072 = 3 x 1024 fused tiles
    pq = build_pq_index(
        jax.random.PRNGKey(0), x, coarse_dim=x.shape[1], refine="int8",
        k_factor=8, keep_codes=False,
    )
    grid = default_grid(pq)
    fused_pts = [g for g in grid if g.get("fused")]
    assert fused_pts, grid
    assert all(g["fused_bins"] == 2048 and g["fused_tile"] == 16384 for g in fused_pts)
    assert all(g["k_factor"] >= 8 for g in fused_pts)
    tuned = apply_runtime_params(pq, fused_pts[0])
    assert tuned.kernel == "fused" and tuned.fused_bins == 2048 and tuned.fused_tile == 16384
    # scan points leave the kernel untouched
    scan_pt = next(g for g in grid if not g.get("fused"))
    assert apply_runtime_params(pq, scan_pt).kernel == "scan"
    # the whole grid sweeps without error and selection meets the target
    qd, gt = _queries_and_gt(x)
    pts = sweep_operating_points(pq, qd, gt, top_k=10, measure_time=False)
    assert len(pts) == len(grid)
    best = select_operating_point(pts, target_recall=0.7)
    assert best.recall >= 0.7


def test_default_grids_shape():
    x = _corpus(n=1024)
    ivf = build_ivfpq_index(
        jax.random.PRNGKey(0), x, n_clusters=16, nprobe=4, window=256,
        n_subquantizers=8, kmeans_iters=2, refine="float32", approx_recall=None,
    )
    assert default_grid(ivf) == [{"nprobe": p} for p in (1, 2, 4, 8, 16)]
    flat = build_dense_index(x, dtype="float32")
    assert default_grid(flat) == [{}]
    pts = sweep_operating_points(flat, *_queries_and_gt(x), top_k=10, measure_time=False)
    assert len(pts) == 1 and pts[0].recall == 1.0
