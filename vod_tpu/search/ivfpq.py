"""IVF-PQ: cell-pruned PQ search (parity: faiss `OPQ{M},IVF{n},PQ{M}x{b}[,Refine]`).

The reference's default dense factory is `OPQ32_512,IVFauto,PQ32x8`
(`/root/reference/src/vod_exps/hydra/datasets/search_defaults/faiss/default.yaml:2`,
built in `/root/reference/src/vod_search/faiss_search/build_gpu.py:103-153`): an
inverted file prunes the candidate set to `nprobe` cells before ADC scoring.
The repo's exhaustive-ADC `PQIndex` deliberately skips the IVF stage — on TPU a
streaming MXU scan beats cell-probing for LARGE query batches, where the scan
cost is shared across the whole batch. But at serving batch sizes the scan's
fixed decode cost dominates (measured 61 ms per 64-query block at 8.8M —
`examples/pq4_adc_variants_bench.py`), and there cell pruning is the answer:
scan ~nprobe/C of the corpus per query instead of all of it.

TPU-first design (vs faiss's per-cell variable-length inverted lists):

  * Cluster-sorted FLAT layout. Rows are reordered by k-means cell; each
    cell is padded up to a multiple of a fixed `window` (e.g. 512 rows) inside
    the same flat arrays. No per-cell max-size padding (a 2-3x HBM blowup for
    skewed k-means at scale) — total padding is < `window` rows per cell.
  * Static window probing. A probed cell is a [win_start, win_start+win_count)
    range of fixed-size windows; a query's candidate set is the FIRST
    `max_windows` windows of its `nprobe` best cells (probe order = descending
    centroid score, so truncation drops the least promising cells). The
    window-id list is computed with a vmapped searchsorted over the cumulative
    window counts — fully static shapes, jit-friendly.
  * Gathered-window scoring. Windows are rows of a [n_windows, window, ...]
    view of the stored rows, so candidate generation is ONE gather of large
    contiguous blocks per scoring chunk.
  * Refine rows ARE the scoring rows. With per-query candidate sets, a
    one-hot ADC decode costs B x rows x (M x n_codes) temp bytes — the
    nprobe/C pruning factor exactly cancels the batch sharing that makes the
    exhaustive scan fast, so IVF + per-query ADC never beats the exhaustive
    scan. Instead, when rerank rows exist (int8, optionally truncated-PCA —
    the production `refine` store), probed windows are scored DIRECTLY
    against them: R gathered bytes per (query, row) instead of M*n_codes
    one-hot bytes (128 vs 2048 at pq128x4), no ADC stage, and no ADC
    candidate loss inside probed cells. PQ codes are then optional
    (`keep_codes=False` drops them); the ADC decode path remains for
    no-refine indexes.

Centroids, codes and the coarse assignment all live in the OPQ-rotated space;
refine rows live in the original space (as in `dense.py:_build_refine`).
"""

from __future__ import annotations

import typing as typ

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vod_tpu.ops import pq as pq_ops
from vod_tpu.types.retrieval import RetrievalBatch
from .base import SearchQueries
from .dense import _FROM_INDEX, _pack_codes4, _unpack_codes4

# scoring-stage temp budget (bytes): bounds B*rows_per_chunk*row_cost where
# row_cost counts ALL live temps per (query, row) — see ivfpq_search
_OH_BUDGET = 1 << 28


@struct.dataclass
class IVFPQIndex:
    """Cell-pruned PQ index in the cluster-sorted window layout."""

    centroids: jax.Array  # [C, D] f32 (rotated space)
    codebooks: jax.Array  # [M, n_codes, dsub] f32
    # [N_sorted, M] uint8 (or [N_sorted, M//2] packed, 4-bit); None when the
    # refine rows are the scoring store (`keep_codes=False`)
    codes: typ.Optional[jax.Array]
    row_ids: jax.Array  # [N_sorted] int32 original row id, -1 for cell padding
    win_start: jax.Array  # [C] int32 first window of each cell
    win_count: jax.Array  # [C] int32 windows in each cell
    rotation: typ.Optional[jax.Array] = None  # [D, D] OPQ (None = identity)
    subset_ids: typ.Optional[jax.Array] = None  # [N_sorted] int32 (sorted layout)
    refine_codes: typ.Optional[jax.Array] = None  # [N_sorted, R] (sorted layout)
    refine_scale: typ.Optional[jax.Array] = None  # [1, R] f32 when int8 refine
    refine_proj: typ.Optional[jax.Array] = None  # [D, R] truncated-PCA (None = raw)
    # faiss IndexRefine analogue on top of IVF (`RFlat`/`Refine(SQ8)` in the
    # reference's factory strings, `vod_configs/search.py` faiss spec): when
    # rerank rows exist, the window stage pools the top `k_factor*top_k`
    # candidates and ONE exact gathered int8 matmul re-ranks them against this
    # higher-fidelity store. Stored in ORIGINAL row order and gathered by row
    # id, so SOAR spilling costs no second copy.
    rerank_codes: typ.Optional[jax.Array] = None  # [N, R2] int8 (ORIGINAL order)
    rerank_scale: typ.Optional[jax.Array] = None  # [1, R2] f32 when int8
    rerank_proj: typ.Optional[jax.Array] = None  # [D, R2] truncated-PCA (None = raw)
    n_real: int = struct.field(pytree_node=False, default=0)
    offset: int = struct.field(pytree_node=False, default=0)
    window: int = struct.field(pytree_node=False, default=512)
    nprobe: int = struct.field(pytree_node=False, default=32)
    max_windows: int = struct.field(pytree_node=False, default=0)  # 0 = nprobe cells, untruncated
    # candidate-pool widening for the rerank stage; inert without rerank_codes
    # (the refine rows are then the FINAL scoring store — no pool to widen)
    k_factor: int = struct.field(pytree_node=False, default=16)
    code_bits: int = struct.field(pytree_node=False, default=8)
    approx_recall: typ.Optional[float] = struct.field(pytree_node=False, default=0.95)
    # SOAR spilling (Sun et al., NeurIPS 2023 — ScaNN's `soar`): every row is
    # stored under TWO cells, so search must dedup equal-id candidates
    spilled: bool = struct.field(pytree_node=False, default=False)


def assign_soar(
    x: jax.Array,
    centroids: jax.Array,
    assign: jax.Array,
    *,
    soar_lambda: float = 1.0,
    chunk: int = 2048,
) -> jax.Array:
    """Secondary (spilled) cell per row — SOAR (Sun, Guo & Simcha, NeurIPS
    2023; ScaNN's `soar_lambda`). Beyond faiss (no spilling upstream).

    The primary assignment's worst queries are the ones parallel to its
    residual r = x - c1; SOAR picks the second cell minimizing
    ``||x-c'||^2 + lambda * <x-c', r_hat>^2`` over c' != c1, i.e. one whose
    residual is ORTHOGONAL to r, so whenever the primary cell misses the
    probe list for such a query the copy is in a cell that scores it well.
    Chunked like `_assign_chunked`; everything is MXU matmuls.
    """
    n, d = x.shape
    c = centroids.shape[0]
    cent = centroids.astype(jnp.float32)
    c_sq = jnp.sum(cent**2, axis=-1)  # [C]
    iota_c = jnp.arange(c, dtype=jnp.int32)

    n_chunks = max(1, -(-n // chunk))
    pad = n_chunks * chunk - n
    x_pad = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))
    a_pad = jnp.pad(assign.astype(jnp.int32), (0, pad))

    def one(args):
        xc, ac = args  # [chunk, D], [chunk]
        r = xc - cent[ac]
        r_hat = r / (jnp.linalg.norm(r, axis=-1, keepdims=True) + 1e-12)
        ip = jnp.dot(xc, cent.T, preferred_element_type=jnp.float32)  # [chunk, C]
        dist = c_sq[None, :] - 2.0 * ip  # ||x-c'||^2 minus the per-row ||x||^2 const
        # <x - c', r_hat> = <x, r_hat> - <c', r_hat>
        xr = jnp.sum(xc * r_hat, axis=-1, keepdims=True)
        cr = jnp.dot(r_hat, cent.T, preferred_element_type=jnp.float32)
        loss = dist + soar_lambda * (xr - cr) ** 2
        loss = jnp.where(iota_c[None, :] == ac[:, None], jnp.inf, loss)
        return jnp.argmin(loss, axis=-1).astype(jnp.int32)

    out = jax.lax.map(one, (x_pad.reshape(n_chunks, chunk, d), a_pad.reshape(n_chunks, chunk)))
    return out.reshape(-1)[:n]


def _dedup_equal_rows(scores: jax.Array, indices: jax.Array, top_k: int) -> tuple[jax.Array, jax.Array]:
    """Keep one copy per row id, then cut to top_k.

    Spilled copies are EXACT duplicates (codes/refine rows encode the raw row,
    not a cell residual, so both copies score identically) — masking any one
    of an equal-id pair is lossless. `-1` padding ids are exempt (already
    -inf-scored)."""
    order = jnp.argsort(indices, axis=-1)
    sid = jnp.take_along_axis(indices, order, axis=-1)
    ss = jnp.take_along_axis(scores, order, axis=-1)
    dup = (sid[:, 1:] == sid[:, :-1]) & (sid[:, 1:] >= 0)
    ss = jnp.concatenate([ss[:, :1], jnp.where(dup, -jnp.inf, ss[:, 1:])], axis=-1)
    out_s, pos = jax.lax.top_k(ss, min(top_k, ss.shape[-1]))
    out_i = jnp.take_along_axis(sid, pos, axis=-1)
    return out_s, jnp.where(jnp.isfinite(out_s), out_i, -1)


def rerank_candidates(
    q: jax.Array,  # [B, D] query vectors (original space)
    cand_s: jax.Array,  # [B, pool] candidate scores (validity mask only)
    cand_i: jax.Array,  # [B, pool] candidate row ids (offset applied), -1 pad
    top_k: int,
    *,
    rerank_codes: jax.Array,  # [n_real, R2] ORIGINAL row order
    rerank_scale: typ.Optional[jax.Array],
    rerank_proj: typ.Optional[jax.Array],
    offset: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Exact re-rank of pooled candidates against the rerank store — one
    [B, pool, R2] gather by ORIGINAL row id + one int8 MXU matmul (B=64,
    pool=160, R2=256 gathers ~2.6 MB, negligible next to the probed-window
    read). Shared by `ivfpq_search` and the sharded post-merge path (faiss
    IndexRefine `search` parity: pool k_factor*k, rescore, cut to k)."""
    n_rr = rerank_codes.shape[0]
    rid = jnp.clip(cand_i - offset, 0, n_rr - 1)
    rows_rr = rerank_codes[rid]  # [B, pool, R2]
    q_rr = q.astype(jnp.float32)
    if rerank_proj is not None:
        q_rr = q_rr @ rerank_proj
    if rerank_scale is not None:
        q_f = q_rr * rerank_scale
        q_row = jnp.maximum(jnp.max(jnp.abs(q_f), axis=-1, keepdims=True), 1e-8) / 127.0
        q_i8 = jnp.clip(jnp.round(q_f / q_row), -127, 127).astype(jnp.int8)
        acc = jnp.einsum("bd,brd->br", q_i8, rows_rr, preferred_element_type=jnp.int32)
        s_rr = acc.astype(jnp.float32) * q_row
    else:
        s_rr = jnp.einsum(
            "bd,brd->br", q_rr.astype(rows_rr.dtype), rows_rr,
            preferred_element_type=jnp.float32,
        )
    s_rr = jnp.where(jnp.isfinite(cand_s) & (cand_i >= 0), s_rr, -jnp.inf)
    out_s, sel = jax.lax.top_k(s_rr, min(top_k, s_rr.shape[-1]))
    out_i = jnp.take_along_axis(cand_i, sel, axis=-1)
    return out_s, jnp.where(jnp.isfinite(out_s), out_i, -1)


def _sorted_window_layout(
    assign_np: np.ndarray,
    n_cells: int,
    window: int,
    nprobe: int,
    max_windows: typ.Optional[int],
) -> tuple[np.ndarray, int, np.ndarray, np.ndarray, int]:
    """Cluster-sorted padded-window layout shared by the host/device builders.

    Returns `(dst, total, win_start, win_count, max_windows)` where `dst[i]`
    is the padded-layout slot of original row `i` and `total` the slot count.
    `max_windows=None` sizes the per-query window budget as nprobe cells of
    ~1.5x the mean cell's windows (truncation then only bites pathologically
    skewed probes; the probe order drops the least promising cells first).
    """
    n_real = int(assign_np.shape[0])
    order = np.argsort(assign_np, kind="stable")
    counts = np.bincount(assign_np, minlength=n_cells)
    wcounts = -(-counts // window)  # ceil; 0 for empty cells
    starts_pad = np.concatenate([[0], np.cumsum(wcounts * window)])
    total = int(starts_pad[-1])
    # dst[i] = padded-layout position of original row i (vectorized scatter map)
    sorted_assign = assign_np[order]
    cell_first = np.concatenate([[0], np.cumsum(counts)])[:-1]
    within = np.arange(n_real, dtype=np.int64) - cell_first[sorted_assign]
    dst = np.empty(n_real, np.int64)
    dst[order] = starts_pad[sorted_assign] + within
    win_start = (starts_pad[:-1] // window).astype(np.int32)
    win_count = wcounts.astype(np.int32)
    if max_windows is None:
        nonempty = wcounts[wcounts > 0]
        mean_w = float(nonempty.mean()) if nonempty.size else 1.0
        max_windows = int(min(int(wcounts.sum()), nprobe * max(1, int(np.ceil(1.5 * mean_w)))))
    return dst, total, win_start, win_count, int(max_windows)


def build_ivfpq_from_parts(
    centroids: jax.Array,
    codebooks: jax.Array,
    assign_np: np.ndarray,  # [N] int32 cell id per row
    codes_np: typ.Optional[np.ndarray],  # [N, M or M//2] uint8; None = refine rows only
    *,
    rotation: typ.Optional[jax.Array] = None,
    refine_np: typ.Optional[np.ndarray] = None,  # [N, R] int8 (original order)
    refine_scale: typ.Optional[jax.Array] = None,
    refine_proj: typ.Optional[jax.Array] = None,
    rerank_np: typ.Optional[np.ndarray] = None,  # [n_real, R2] int8 (ORIGINAL order, not spilled)
    rerank_scale: typ.Optional[jax.Array] = None,
    rerank_proj: typ.Optional[jax.Array] = None,
    k_factor: int = 16,
    subset_ids_np: typ.Optional[np.ndarray] = None,
    window: int = 512,
    nprobe: int = 32,
    max_windows: typ.Optional[int] = None,
    code_bits: int = 8,
    offset: int = 0,
    approx_recall: typ.Optional[float] = 0.95,
    row_ids_np: typ.Optional[np.ndarray] = None,  # [rows] original id per stored row
    n_real: typ.Optional[int] = None,  # distinct real rows (= rows unless spilled)
    spilled: bool = False,
) -> IVFPQIndex:
    """Assemble the sorted window layout from precomputed parts (host-side).

    Shared by the on-device build and slab-wise builds at beyond-HBM scale
    (parity: faiss's chunked `index.add`, `faiss_search/build.py:51-81`).
    SOAR-spilled builds pass every row TWICE (primary + secondary assignment)
    with `row_ids_np` carrying the duplicated original ids and `spilled=True`.
    """
    n_rows = int(assign_np.shape[0])
    if n_real is None:
        n_real = n_rows
    c = int(centroids.shape[0])
    dst, total, win_start, win_count, max_windows = _sorted_window_layout(
        assign_np, c, window, nprobe, max_windows
    )

    if codes_np is None and refine_np is None:
        raise ValueError("need codes_np and/or refine_np to score against")
    codes_sorted = None
    if codes_np is not None:
        codes_sorted = np.zeros((total, codes_np.shape[1]), np.uint8)
        codes_sorted[dst] = codes_np
    row_ids = np.full((total,), -1, np.int32)
    row_ids[dst] = (
        np.arange(n_rows, dtype=np.int32) if row_ids_np is None
        else row_ids_np.astype(np.int32)
    )
    subs = None
    if subset_ids_np is not None:
        subs = np.full((total,), -1, np.int32)
        subs[dst] = subset_ids_np
    refine_sorted = None
    if refine_np is not None:
        refine_sorted = np.zeros((total, refine_np.shape[1]), refine_np.dtype)
        refine_sorted[dst] = refine_np

    return IVFPQIndex(
        centroids=jnp.asarray(centroids, dtype=jnp.float32),
        codebooks=codebooks,
        codes=None if codes_sorted is None else jax.device_put(codes_sorted),
        row_ids=jax.device_put(row_ids),
        win_start=jax.device_put(win_start),
        win_count=jax.device_put(win_count),
        rotation=rotation,
        subset_ids=None if subs is None else jax.device_put(subs),
        refine_codes=None if refine_sorted is None else jax.device_put(refine_sorted),
        refine_scale=refine_scale,
        refine_proj=refine_proj,
        rerank_codes=None if rerank_np is None else jax.device_put(rerank_np),
        rerank_scale=rerank_scale,
        rerank_proj=rerank_proj,
        k_factor=k_factor,
        n_real=n_real,
        offset=offset,
        window=window,
        nprobe=nprobe,
        max_windows=int(max_windows),
        code_bits=code_bits,
        approx_recall=approx_recall,
        spilled=spilled,
    )


def train_ivfpq_stages(
    rng: jax.Array,
    train: jax.Array,
    *,
    n_subquantizers: int,
    code_bits: int,
    kmeans_iters: int,
    opq_iters: int,
    use_opq: bool,
    keep_codes: bool,
    n_clusters: typ.Optional[int],
    n_total: int,
    mesh: typ.Any = None,
    mesh_axis: str = "shard",
    aniso_eta: pq_ops.AnisoEta = None,
) -> tuple[typ.Optional[jax.Array], jax.Array, jax.Array, typ.Optional[float]]:
    """Train the IVF-PQ stages shared by the in-HBM and host-slab builders.

    Returns `(rotation, codebooks, centroids, resolved_aniso_eta)` — the last
    must be forwarded to `encode_pq_auto` so database codes are assigned under
    the trained objective. Keeping this in ONE place
    pins the details both builders must agree on for equal-config equality:
    the OPQ inner-kmeans budget (`max(2, kmeans_iters // 2)`), the coarse
    quantizer's seed fold (`fold_in(rng, 17)`), and `IVFauto` centroid
    inference from the TOTAL row count (not the training-sample size).
    """
    from vod_tpu.ops.kmeans import infer_n_clusters, kmeans

    n_codes = 1 << code_bits
    d = train.shape[-1]
    rotation = None
    aniso_resolved = None
    if not keep_codes:
        # refine rows are the scoring store; skip PQ/OPQ training outright
        codebooks = jnp.zeros((1, 1, d), jnp.float32)
        train_rot = train
    else:
        rotation, codebooks, aniso_resolved = pq_ops.train_pq_codebooks(
            rng, train, n_subquantizers, n_codes=n_codes,
            kmeans_iters=kmeans_iters, use_opq=use_opq, opq_iters=opq_iters,
            aniso_eta=aniso_eta,
        )
        train_rot = train if rotation is None else train @ rotation
    c = n_clusters or infer_n_clusters(n_total)
    if mesh is not None:
        from vod_tpu.ops.kmeans import kmeans_sharded

        centroids, _ = kmeans_sharded(
            jax.random.fold_in(rng, 17), train_rot, n_clusters=c, mesh=mesh,
            axis=mesh_axis, n_iters=kmeans_iters,
        )
    else:
        centroids, _ = kmeans(
            jax.random.fold_in(rng, 17), train_rot, n_clusters=c, n_iters=kmeans_iters
        )
    return rotation, codebooks, centroids, aniso_resolved


def train_refine_int8_params(
    train: jax.Array, refine_dim: typ.Optional[int]
) -> tuple[typ.Optional[jax.Array], jax.Array]:
    """(proj, scale) for int8 refine rows trained from a sample — the
    beyond-HBM counterpart of `dense._build_refine` (which scales against the
    FULL matrix; a host-slab build can only see the training sample)."""
    proj = None
    ref = train
    if refine_dim is not None and refine_dim < train.shape[-1]:
        proj, _mean = pq_ops.train_projection(train, refine_dim)
        ref = train @ proj
    scale = jnp.maximum(jnp.max(jnp.abs(ref), axis=0, keepdims=True), 1e-8) / 127.0
    return proj, scale


def build_ivfpq_index(
    rng: jax.Array,
    vectors: jax.Array,
    *,
    n_clusters: typ.Optional[int] = None,
    nprobe: int = 32,
    window: int = 512,
    max_windows: typ.Optional[int] = None,
    n_subquantizers: int = 32,
    code_bits: int = 8,
    train_size: typ.Optional[int] = None,
    kmeans_iters: int = 10,
    use_opq: bool = False,
    opq_iters: int = 4,
    refine: str = "none",
    refine_dim: typ.Optional[int] = None,
    rerank: str = "none",
    rerank_dim: typ.Optional[int] = None,
    k_factor: int = 16,
    keep_codes: bool = True,
    subset_ids: typ.Optional[jax.Array] = None,
    offset: int = 0,
    approx_recall: typ.Optional[float] = 0.95,
    mesh: typ.Any = None,
    mesh_axis: str = "shard",
    aniso_eta: pq_ops.AnisoEta = None,
    spill: bool = False,
    soar_lambda: float = 1.0,
) -> IVFPQIndex:
    """On-device IVF-PQ build (parity: `build_gpu.py:103` `_train_ivf` +
    PQ training; `IVFauto` centroid inference as `support.py:13`).
    With a `mesh`, the coarse quantizer trains via multi-device Lloyd
    iterations (`ops/kmeans.kmeans_sharded`, faiss multi-GPU clustering
    parity `build_gpu.py:103-144`).

    refine='int8' (optionally with `refine_dim` truncated-PCA rows) stores
    rerank rows in the sorted layout; bf16/f32 refine also supported. With a
    refine store the search scores those rows directly, so `keep_codes=False`
    skips PQ training entirely and drops the codes — an IVF + (PCA-)SQ index
    at R + 4 bytes/row.

    `spill=True` additionally stores every row under a SOAR secondary cell
    (`assign_soar`) — recall at equal nprobe for 2x the stored bytes; search
    dedups the equal-id copies exactly.
    """
    from vod_tpu.ops.kmeans import _assign_chunked

    if code_bits not in (8, 4):
        raise ValueError(f"code_bits must be 8 or 4, got {code_bits}")
    if code_bits == 4 and n_subquantizers % 2:
        raise ValueError("code_bits=4 requires an even n_subquantizers (nibble packing)")
    if not keep_codes and refine == "none":
        raise ValueError("keep_codes=False requires a refine store to score against")
    n_real, d = vectors.shape
    x = vectors.astype(jnp.float32)
    train = x if train_size is None or train_size >= n_real else x[:train_size]

    rotation, codebooks, centroids, aniso_resolved = train_ivfpq_stages(
        rng, train,
        n_subquantizers=n_subquantizers, code_bits=code_bits,
        kmeans_iters=kmeans_iters, opq_iters=opq_iters,
        use_opq=use_opq, keep_codes=keep_codes,
        n_clusters=n_clusters, n_total=n_real, mesh=mesh, mesh_axis=mesh_axis,
        aniso_eta=aniso_eta,
    )
    x_rot = x if rotation is None else x @ rotation
    assign = _assign_chunked(x_rot, centroids)
    assign_np = np.asarray(assign).astype(np.int32)

    codes_np = None
    if keep_codes:
        codes = pq_ops.encode_pq_auto(codebooks, x_rot, eta=aniso_resolved)
        if code_bits == 4:
            codes = _pack_codes4(codes)
        codes_np = np.asarray(codes)

    refine_np = refine_scale = refine_proj = None
    if refine != "none":
        from .dense import _build_refine

        rc, refine_scale, refine_proj = _build_refine(x, refine, 1, refine_dim=refine_dim, train=train)
        refine_np = np.asarray(rc)

    # faiss IndexRefine analogue: a second, higher-fidelity store in ORIGINAL
    # row order re-ranks the pooled top k_factor*k window candidates exactly
    rerank_np = rerank_scale = rerank_proj = None
    if rerank != "none":
        from .dense import _build_refine

        rr, rerank_scale, rerank_proj = _build_refine(x, rerank, 1, refine_dim=rerank_dim, train=train)
        rerank_np = np.asarray(rr)

    row_ids_np = None
    subset_ids_np = None if subset_ids is None else np.asarray(subset_ids).astype(np.int32)
    if spill:
        # SOAR: duplicate every row under its secondary cell (same codes /
        # refine rows — they encode the raw row, so copies score identically)
        assign2_np = np.asarray(
            assign_soar(x_rot, centroids, assign, soar_lambda=soar_lambda)
        ).astype(np.int32)
        assign_np = np.concatenate([assign_np, assign2_np])
        row_ids_np = np.tile(np.arange(n_real, dtype=np.int32), 2)
        if codes_np is not None:
            codes_np = np.concatenate([codes_np, codes_np])
        if refine_np is not None:
            refine_np = np.concatenate([refine_np, refine_np])
        if subset_ids_np is not None:
            subset_ids_np = np.tile(subset_ids_np, 2)

    return build_ivfpq_from_parts(
        centroids,
        codebooks,
        assign_np,
        codes_np,
        rotation=rotation,
        refine_np=refine_np,
        refine_scale=refine_scale,
        refine_proj=refine_proj,
        rerank_np=rerank_np,
        rerank_scale=rerank_scale,
        rerank_proj=rerank_proj,
        k_factor=k_factor,
        subset_ids_np=subset_ids_np,
        window=window,
        nprobe=nprobe,
        max_windows=max_windows,
        code_bits=code_bits,
        offset=offset,
        approx_recall=approx_recall,
        row_ids_np=row_ids_np,
        n_real=n_real,
        spilled=spill,
    )


def build_ivfpq_from_device_parts(
    centroids: jax.Array,
    codebooks: jax.Array,
    assign_np: np.ndarray,  # [N] int32 (host; sizes the layout)
    codes_dev: typ.Optional[jax.Array],  # [N, Mc] uint8 ON DEVICE (None = refine only)
    *,
    refine_dev: typ.Optional[jax.Array] = None,  # [N, R] int8 ON DEVICE
    refine_scale: typ.Optional[jax.Array] = None,
    refine_proj: typ.Optional[jax.Array] = None,
    rerank_dev: typ.Optional[jax.Array] = None,  # [n_real, R2] int8 ON DEVICE (original order)
    rerank_scale: typ.Optional[jax.Array] = None,
    rerank_proj: typ.Optional[jax.Array] = None,
    k_factor: int = 16,
    rotation: typ.Optional[jax.Array] = None,
    subset_ids_np: typ.Optional[np.ndarray] = None,
    window: int = 512,
    nprobe: int = 32,
    max_windows: typ.Optional[int] = None,
    code_bits: int = 8,
    offset: int = 0,
    approx_recall: typ.Optional[float] = 0.95,
    row_ids_np: typ.Optional[np.ndarray] = None,
    n_real: typ.Optional[int] = None,
    spilled: bool = False,
) -> IVFPQIndex:
    """Assemble the sorted window layout when the big arrays already live in
    HBM (slab-wise builds at 8.8M+ scale — a host round-trip of the code/refine
    matrices is the expensive part; parity: `faiss_search/build.py:51-81`
    chunked add). Only the [N] assignment vector crosses to the host; the
    permutation into the padded layout runs as one device scatter per array.
    SOAR-spilled builds pass duplicated rows + `row_ids_np`/`spilled` exactly
    as `build_ivfpq_from_parts`.
    """
    n_rows = int(assign_np.shape[0])
    if n_real is None:
        n_real = n_rows
    c = int(centroids.shape[0])
    dst, total, win_start, win_count, max_windows = _sorted_window_layout(
        assign_np, c, window, nprobe, max_windows
    )
    dst_dev = jnp.asarray(dst.astype(np.int32))

    # dst rides as a jit ARGUMENT: closed-over device arrays are embedded as
    # program literals, which the remote-compile relay ships at ~100 s/MB —
    # dst is [total] int32 (~35 MB at 8.8M rows).
    @jax.jit
    def scatter_rows(src, dst):
        out = jnp.zeros((total, src.shape[1]), src.dtype)
        return out.at[dst].set(src)

    @jax.jit
    def scatter_ids(src, dst):
        out = jnp.full((total,), -1, jnp.int32)
        return out.at[dst].set(src)

    codes_sorted = None if codes_dev is None else scatter_rows(codes_dev, dst_dev)
    refine_sorted = None if refine_dev is None else scatter_rows(refine_dev, dst_dev)
    row_ids = scatter_ids(
        jnp.arange(n_rows, dtype=jnp.int32) if row_ids_np is None
        else jnp.asarray(row_ids_np.astype(np.int32)),
        dst_dev,
    )
    subs = None
    if subset_ids_np is not None:
        subs = scatter_ids(jnp.asarray(subset_ids_np.astype(np.int32)), dst_dev)

    return IVFPQIndex(
        centroids=jnp.asarray(centroids, dtype=jnp.float32),
        codebooks=codebooks,
        codes=codes_sorted,
        row_ids=row_ids,
        win_start=jax.device_put(win_start),
        win_count=jax.device_put(win_count),
        rotation=rotation,
        subset_ids=subs,
        refine_codes=refine_sorted,
        refine_scale=refine_scale,
        refine_proj=refine_proj,
        rerank_codes=rerank_dev,
        rerank_scale=rerank_scale,
        rerank_proj=rerank_proj,
        k_factor=k_factor,
        n_real=n_real,
        offset=offset,
        window=window,
        nprobe=nprobe,
        max_windows=int(max_windows),
        code_bits=code_bits,
        approx_recall=approx_recall,
        spilled=spilled,
    )


def _probe_window_ids(
    index: IVFPQIndex, q_eff: jax.Array, w_max: int
) -> tuple[jax.Array, jax.Array]:
    """Per-query window-id lists: [B, W] window ids + [B, W] validity.

    Probes the `nprobe` best cells (descending centroid score) and emits their
    windows in probe order until the static `w_max` budget fills — a vmapped
    searchsorted over the per-query cumulative window counts.
    """
    c = index.centroids.shape[0]
    nprobe = min(index.nprobe, c)
    cscores = jnp.dot(q_eff, index.centroids.T, preferred_element_type=jnp.float32)
    _, cells = jax.lax.top_k(cscores, nprobe)  # [B, P] descending
    ws = index.win_start[cells]  # [B, P]
    wc = index.win_count[cells]  # [B, P]
    cum = jnp.cumsum(wc, axis=-1)  # [B, P]
    slots = jnp.arange(w_max, dtype=wc.dtype)
    p = jax.vmap(lambda cr: jnp.searchsorted(cr, slots, side="right"))(cum)  # [B, W]
    p_safe = jnp.clip(p, 0, nprobe - 1)
    prev = jnp.where(p_safe > 0, jnp.take_along_axis(cum, jnp.maximum(p_safe - 1, 0), axis=-1), 0)
    off = slots[None, :] - prev
    win_id = jnp.take_along_axis(ws, p_safe, axis=-1) + off
    valid = slots[None, :] < cum[:, -1:]
    return jnp.where(valid, win_id, 0).astype(jnp.int32), valid


def ivfpq_search(
    index: IVFPQIndex,
    queries: SearchQueries,
    top_k: int,
    *,
    approx_recall: typ.Any = _FROM_INDEX,
) -> RetrievalBatch:
    """Cell-pruned ADC search + optional exact re-rank.

    Parity: faiss IVFPQ `search` with `nprobe` (`faiss_search/server.py:77`
    serving path). Large batches are mapped over sub-batches so the one-hot
    decode temp stays bounded — IVF's sweet spot is small serving batches;
    exhaustive `pq_search` wins for batch-embedding workloads.
    """
    if approx_recall is _FROM_INDEX:
        approx_recall = index.approx_recall
    q = queries.vector
    if q is None:
        raise ValueError("ivfpq_search requires queries.vector")
    b, d = q.shape
    m = index.codebooks.shape[0]
    n_codes = index.codebooks.shape[1]
    window = index.window
    do_refine = index.refine_codes is not None
    if not do_refine and index.codes is None:
        raise ValueError("IVFPQIndex built with keep_codes=False requires refine rows")

    # per-(query, row) gathered/temp bytes of the scoring stage: R rerank
    # bytes on the refine path; on the ADC path the bool one-hot and its
    # bf16 cast coexist (3 B per (M, n_codes) entry) plus the decoded bf16
    # row (2 B per dim)
    if do_refine:
        row_cost = index.refine_codes.shape[-1] * index.refine_codes.dtype.itemsize
    else:
        row_cost = 3 * m * n_codes + 2 * d
    # bound the per-chunk gather/temp: chunk queries first, then windows
    qchunk = max(8, _OH_BUDGET // (window * row_cost))
    if b > qchunk:
        pad = (-b) % qchunk
        qp = jnp.pad(q, ((0, pad), (0, 0))) if pad else q
        sub = queries.subset_ids
        subp = None
        if sub is not None:
            subp = jnp.pad(sub, ((0, pad), (0, 0)), constant_values=-1) if pad else sub
            subp = subp.reshape((b + pad) // qchunk, qchunk, -1)

        def one(args):
            vec, ss = args
            return ivfpq_search(
                index, SearchQueries(vector=vec, subset_ids=ss), top_k,
                approx_recall=approx_recall,
            )

        out = jax.lax.map(one, (qp.reshape((b + pad) // qchunk, qchunk, d), subp))
        return RetrievalBatch(
            scores=out.scores.reshape(b + pad, top_k)[:b],
            indices=out.indices.reshape(b + pad, top_k)[:b],
        )

    q_eff = q.astype(jnp.float32)
    if index.rotation is not None:
        q_eff = q_eff @ index.rotation

    n_sorted = index.row_ids.shape[0]
    n_windows = n_sorted // window
    w_max = index.max_windows if index.max_windows > 0 else n_windows
    w_max = min(w_max, n_windows)
    # windows per scoring chunk, bounded by the gather/temp budget
    wchunk = max(1, _OH_BUDGET // (b * window * row_cost))
    wchunk = min(wchunk, w_max)
    w_pad = -(-w_max // wchunk) * wchunk
    n_wchunks = w_pad // wchunk

    win_id, valid = _probe_window_ids(index, q_eff, w_max)
    if w_pad > w_max:
        win_id = jnp.pad(win_id, ((0, 0), (0, w_pad - w_max)))
        valid = jnp.pad(valid, ((0, 0), (0, w_pad - w_max)))

    rows_w = index.row_ids.reshape(n_windows, window)
    subs_w = None
    allowed = queries.subset_ids
    if allowed is not None and index.subset_ids is not None:
        subs_w = index.subset_ids.reshape(n_windows, window)

    # with a rerank store the window stage pools a widened candidate set for
    # the exact re-rank below (faiss IndexRefine semantics); otherwise the
    # window-scoring order is final
    do_rerank = index.rerank_codes is not None
    pool = max(1, index.k_factor) * top_k if do_rerank else top_k

    rc = wchunk * window  # rows per scoring chunk
    # a spilled index may hold BOTH copies of a row in one chunk, so keep
    # 2*pool candidates per chunk to guarantee the top-pool DISTINCT rows
    # survive the per-chunk cut
    kc = min(rc, 2 * pool if index.spilled else pool)

    if do_refine:
        # Score gathered windows DIRECTLY against the rerank rows — the
        # ordering the ADC+refine pipeline would produce, minus the ADC
        # candidate loss, at R gathered bytes/row. int8 rows ride the int8
        # MXU with the per-dim scale folded into a row-quantized query.
        refine_w = index.refine_codes.reshape(n_windows, window, -1)
        q_ref = q.astype(jnp.float32)
        if index.refine_proj is not None:
            q_ref = q_ref @ index.refine_proj
        if index.refine_scale is not None:
            q_f = q_ref * index.refine_scale
            q_row = jnp.maximum(jnp.max(jnp.abs(q_f), axis=-1, keepdims=True), 1e-8) / 127.0
            q_i8 = jnp.clip(jnp.round(q_f / q_row), -127, 127).astype(jnp.int8)
    else:
        codes_w = index.codes.reshape(n_windows, window, -1)
        unpack = _unpack_codes4 if index.code_bits == 4 else (lambda cc: cc)
        iota = jnp.arange(n_codes, dtype=jnp.int32)

    def score_wchunk(_, wi):
        ids_c = jax.lax.dynamic_slice(win_id, (0, wi * wchunk), (b, wchunk))  # [B, Wc]
        val_c = jax.lax.dynamic_slice(valid, (0, wi * wchunk), (b, wchunk))
        rid = rows_w[ids_c].reshape(b, rc)
        if do_refine:
            raw = refine_w[ids_c].reshape(b, rc, -1)  # [B, rc, R]
            if index.refine_scale is not None:
                acc = jnp.einsum("bd,brd->br", q_i8, raw, preferred_element_type=jnp.int32)
                s = acc.astype(jnp.float32) * q_row
            else:
                s = jnp.einsum(
                    "bd,brd->br", q_ref.astype(raw.dtype), raw,
                    preferred_element_type=jnp.float32,
                )
        else:
            # no rerank rows stored: one-hot ADC decode of the gathered codes
            cand = unpack(codes_w[ids_c]).reshape(b * rc, m)
            oh = (cand.astype(jnp.int32)[:, :, None] == iota[None, None, :])
            dec = jnp.einsum(
                "cmk,mkd->cmd", oh.astype(jnp.bfloat16), index.codebooks.astype(jnp.bfloat16),
                preferred_element_type=jnp.bfloat16,
            ).reshape(b, rc, d)
            s = jnp.einsum(
                "bd,brd->br", q_eff.astype(jnp.bfloat16), dec, preferred_element_type=jnp.float32
            )
        ok = val_c[:, :, None].repeat(window, axis=-1).reshape(b, rc) & (rid >= 0)
        if subs_w is not None:
            sub = subs_w[ids_c].reshape(b, rc)
            ok &= jnp.any(sub[:, :, None] == allowed[:, None, :], axis=-1) | jnp.all(
                allowed < 0, axis=-1, keepdims=True
            )
        s = jnp.where(ok, s, -jnp.inf)
        pos = ids_c[:, :, None].repeat(window, axis=-1).reshape(b, rc) * window
        pos = pos + jnp.tile(jnp.arange(window, dtype=jnp.int32), wchunk)[None, :]
        if approx_recall is not None and kc < rc:
            c_s, c_p = jax.lax.approx_max_k(s, kc, recall_target=approx_recall)
        else:
            c_s, c_p = jax.lax.top_k(s, kc)
        return None, (c_s, jnp.take_along_axis(pos, c_p, axis=-1))

    _, (all_s, all_p) = jax.lax.scan(score_wchunk, None, jnp.arange(n_wchunks))
    all_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_wchunks * kc)
    all_p = jnp.moveaxis(all_p, 0, 1).reshape(b, n_wchunks * kc)
    # spilled: gather 2*pool (a row id may appear twice), dedup, then cut
    k_eff = min(2 * pool if index.spilled else pool, all_s.shape[-1])
    top_s, sel = jax.lax.top_k(all_s, k_eff)
    top_p = jnp.take_along_axis(all_p, sel, axis=-1)

    # sorted-layout positions -> original row ids
    top_i = index.row_ids[jnp.clip(top_p, 0, n_sorted - 1)]
    ok = jnp.isfinite(top_s) & (top_p >= 0) & (top_i >= 0)
    top_s = jnp.where(ok, top_s, -jnp.inf)
    top_i = jnp.where(ok, top_i + index.offset, -1)
    if index.spilled:
        top_s, top_i = _dedup_equal_rows(top_s, top_i, pool)

    if do_rerank:
        top_s, top_i = rerank_candidates(
            q, top_s, top_i, top_k,
            rerank_codes=index.rerank_codes,
            rerank_scale=index.rerank_scale,
            rerank_proj=index.rerank_proj,
            offset=index.offset,
        )

    if top_s.shape[-1] < top_k:
        padk = top_k - top_s.shape[-1]
        top_s = jnp.pad(top_s, ((0, 0), (0, padk)), constant_values=-jnp.inf)
        top_i = jnp.pad(top_i, ((0, 0), (0, padk)), constant_values=-1)
    else:
        top_s, top_i = top_s[:, :top_k], top_i[:, :top_k]
    return RetrievalBatch(scores=top_s, indices=top_i)
