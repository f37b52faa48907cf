"""Search-engine factory configs + diff/override algebra.

Parity: reference `vod_configs/search.py` — `FaissFactoryConfig:124` (factory
string, nprobe, metric, train_size, gpu opts), `ElasticsearchFactoryConfig:168`,
`QdrantFactoryConfig:215`, `HybridSearchFactoryConfig:286`,
`SearchFactoryDefaults:310` with `__add__` diff application.

TPU mapping: faiss factory strings become an explicit dense codec config
(`flat` | `int8` | `pq`); ES becomes the on-device BM25 sparse config; qdrant's
scalar quantization is the `int8` codec. The diff algebra is preserved
(`defaults + per-dataset diff`).
"""

from __future__ import annotations

import re
import typing as typ

import pydantic

from .base import StrictModel, apply_diff

DenseCodec = typ.Literal["flat", "int8", "pq", "ivf", "ivfpq"]
DenseDtype = typ.Literal["float32", "bfloat16", "int8"]


class DenseFactoryConfig(StrictModel):
    """Dense index factory (replaces faiss factory strings + qdrant config).

    Every knob the builders expose is reachable from here (parity: the full
    faiss factory-string surface, reference `vod_configs/search.py:124` +
    `faiss_search/support.py:44`): `use_opq` = the `OPQ{M}_{d},...` prefix,
    codec `ivf` = `IVF{n},Flat` with `nprobe`, `sharded` row-shards the index
    over a mesh axis (reference `sharded_search.py` semantics on ICI), and
    `approx_recall` selects the hardware `approx_max_k` recall target
    (None = exact `lax.top_k`, faiss-`Flat` exactness parity).
    """

    codec: DenseCodec = "flat"
    dtype: DenseDtype = "bfloat16"  # flat-codec storage dtype
    # pq codec; coarse_dim=None = exhaustive ADC (decode+matmul scan, no
    # candidate-recall loss, M B/vector)
    n_subquantizers: int = 32
    # 8 = classic PQ{M}x8; 4 = fast-scan PQ{M}x4 (16-entry codebooks,
    # nibble-packed codes at M/2 B/vec — parity: faiss `PQ{M}x4fs`)
    code_bits: typ.Literal[8, 4] = 8
    coarse_dim: typ.Optional[int] = 32
    n_candidates: int = 1024
    train_size: typ.Optional[int] = None
    kmeans_iters: int = 10
    use_opq: bool = False
    opq_iters: int = 4
    # exact re-rank of the ADC top (k_factor * k) against raw rows
    # (parity: faiss `RFlat` / `Refine(SQ8)` suffixes). refine_dim stores the
    # rerank rows in a truncated-PCA space (refine_dim B/vec int8 instead of D).
    # On the flat/int8 codecs, refine="float32" keeps exact f32 rows rescoring
    # the scan's k_factor*k pool (`Flat,RFlat` analogue) — bf16 score rounding
    # alone costs ~1.1pp recall@10 vs f32 ground truth at 1M x 768.
    refine: typ.Literal["none", "int8", "bfloat16", "float32"] = "none"
    refine_dim: typ.Optional[int] = None
    k_factor: int = 4
    # score-aware (anisotropic) PQ training — beyond-faiss quality lever
    # (ScaNN, Guo et al. ICML 2020). None = off; "auto" = the theorem default
    # eta(T=0.2, d); a float = explicit h_par/h_perp ratio. Applies to the pq
    # and ivfpq codecs (codebook refinement + coordinate-descent encoding).
    aniso_eta: typ.Union[None, float, typ.Literal["auto"]] = None
    # ivf / ivfpq codecs. `ivfpq` = cell-pruned PQ (faiss `IVF{n},PQ{M}x{b}`
    # parity, the reference's default factory shape) in the cluster-sorted
    # window layout — see `search/ivfpq.py`. `ivf_window` is the fixed window
    # granularity; `max_windows` the static per-query window budget
    # (None = ~1.5x mean cell size x nprobe, computed at build).
    n_clusters: typ.Optional[int] = None  # None = IVFauto inference
    nprobe: int = 8
    ivf_window: int = 512
    max_windows: typ.Optional[int] = None
    # pq/ivfpq: False drops the PQ codes entirely (requires `refine`). For
    # `ivfpq`, probed windows score directly against the refine rows (IVF +
    # (PCA-)SQ index). For `pq` (requires `coarse_dim` too), the coarse int8
    # scan's top k_factor*k feed the exact re-rank with no ADC stage — the
    # SERVING codec: one int8 MXU matmul over coarse_dim B/row, none of the
    # one-hot decode temps that make the exhaustive ADC scan fixed-cost heavy
    # at small batches (faiss `PCAR{dc},SQ8,Refine(...)` analogue).
    keep_codes: bool = True
    # ivfpq only: second-stage exact re-rank ON TOP of the window scoring
    # (faiss `IVF...,Refine(...)` / IndexRefine analogue): the window stage
    # pools k_factor*k candidates and ONE gathered int8 matmul rescores them
    # against a higher-fidelity store in ORIGINAL row order (`rerank_dim`
    # truncated-PCA int8). Orthogonal to `refine`, which is the window
    # scoring store itself — refine bounds what the probed windows see,
    # rerank lifts the FINAL top-k fidelity above it.
    rerank: typ.Literal["none", "int8", "bfloat16", "float32"] = "none"
    rerank_dim: typ.Optional[int] = None
    # ivfpq only: SOAR spilling (ScaNN, Sun et al. NeurIPS 2023 — beyond
    # faiss): store every row under a second cell whose residual is orthogonal
    # to the primary's, trading 2x stored bytes for recall at equal nprobe
    spill: bool = False
    soar_lambda: float = 1.0
    # sharding over a device mesh (index sharding, SURVEY §2.10)
    sharded: bool = False
    shard_axis: str = "shard"
    # scan
    chunk: int = 131072
    approx_recall: typ.Optional[float] = 0.95  # None = exact top-k
    # scoring path: "scan" (lax.scan + approx_max_k) or "fused" (Pallas
    # matmul+binned-top-k kernel; 118k vs 109k QPS at 1M x 768). Applies to
    # the flat/int8 codecs and to the pq codec's COARSE stage (where it is
    # the B=64 serving win — the scan's per-chunk score traffic ~doubles the
    # coarse-store read; see PQIndex.kernel).
    # The EXACT Pallas kernel (`fused_mips_topk`) is deliberately not routable:
    # measured slower than both paths at every shape; kept as the exactness
    # oracle the binned kernel is tested against (ops/mips_pallas.py).
    kernel: typ.Literal["scan", "fused"] = "scan"
    # fused-kernel shape knobs (static metadata, replace()-able at runtime):
    # bins = selection width (pool loss ~ (pool-1)/(2*bins)); tile = corpus
    # rows per kernel step, 0 = auto. Small-batch serving wants LARGE tiles
    # (measured 8.8M x 128 int8 B=64: tile 16384 ~2x faster than 2048 — the
    # HBM read roofline); the large-batch headline prefers the 1024 default.
    fused_bins: int = 512
    fused_tile: int = 0
    # closed-loop runtime-knob autotuning after each periodic rebuild (faiss
    # `ParameterSpace`/`OperatingPoints` parity — the reference pins knobs in
    # hydra and never tunes, `search_defaults/faiss/default.yaml`): sweep
    # nprobe / k_factor / n_candidates on a sample of corpus rows against the
    # exact flat ground truth, keep the Pareto front, apply the cheapest point
    # with recall@`autotune_top_k` >= target. None = off. Applies to the
    # pq/ivf/ivfpq codecs, sharded variants included (per-shard window
    # budgets are rescaled); flat has no runtime knobs.
    autotune_target_recall: typ.Optional[float] = None
    autotune_queries: int = 256
    autotune_top_k: int = 10
    autotune_measure_time: bool = False  # True adds honest-relay QPS timing

    @classmethod
    def from_faiss_factory(cls, factory: str, train_size: typ.Optional[int] = None) -> "DenseFactoryConfig":
        """Translate a faiss factory string (parity: `support.py:44` parser).

        `Flat` -> flat/f32; `IVF{n},Flat`/`IVFauto,Flat` -> ivf codec (n_clusters
        inferred for `auto`, `support.py:13`); `...PQ{M}x8...` -> pq codec with M
        subquantizers; `...PQ{M}x4fs[r]...` -> the 4-bit fast-scan codec
        (16-entry codebooks, nibble-packed codes); an `OPQ{M}_{d},` prefix
        enables the OPQ rotation and feeds the coarse projection dim.
        """
        m_pq = re.search(r"PQ(\d+)x(8|4)", factory)
        m_ivf = re.search(r"IVF(\d+|auto)", factory)
        if m_pq:
            m_opq = re.search(r"OPQ\d+_(\d+)", factory)
            # faiss refine suffixes: `...,RFlat` = f32 re-rank, `...,Refine(SQ8)`
            # = int8 re-rank (`support.py:44` grammar)
            refine = "none"
            if re.search(r"Refine\(SQ8\)", factory):
                refine = "int8"
            elif re.search(r",RFlat", factory):
                refine = "float32"
            if m_ivf:
                # `OPQ…,IVF{n},PQ{M}x{b}` — the reference's default factory
                # shape (`hydra/datasets/search_defaults/faiss/default.yaml:2`)
                # -> the cell-pruned ivfpq codec (exhaustive ADC has no coarse
                # stage, so the OPQ dim feeds nothing here)
                n_c = None if m_ivf.group(1) == "auto" else int(m_ivf.group(1))
                return cls(
                    codec="ivfpq",
                    n_clusters=n_c,
                    n_subquantizers=int(m_pq.group(1)),
                    code_bits=int(m_pq.group(2)),
                    use_opq=m_opq is not None,
                    refine=refine,
                    train_size=train_size,
                )
            return cls(
                codec="pq",
                n_subquantizers=int(m_pq.group(1)),
                code_bits=int(m_pq.group(2)),
                coarse_dim=min(64, int(m_opq.group(1)) if m_opq else 32),
                use_opq=m_opq is not None,
                refine=refine,
                train_size=train_size,
            )
        if "Flat" in factory and factory.strip() == "Flat":
            return cls(codec="flat", dtype="float32")
        if m_ivf:
            n_c = None if m_ivf.group(1) == "auto" else int(m_ivf.group(1))
            return cls(codec="ivf", n_clusters=n_c, train_size=train_size)
        return cls(codec="flat", dtype="bfloat16", train_size=train_size)

    def __add__(self, diff: typ.Optional[typ.Mapping | pydantic.BaseModel]) -> "DenseFactoryConfig":
        return apply_diff(self, diff)


class SparseFactoryConfig(StrictModel):
    """Sparse BM25 factory (replaces `ElasticsearchFactoryConfig` + es_body)."""

    k1: float = 1.2
    b: float = 0.75
    max_postings: int = 2048
    language: typ.Optional[str] = None  # analyzer language (stopwords + stemmer)
    lowercase: bool = True
    min_token_len: int = 2
    # Stem tokens after the stopword filter (parity: ES language analyzers
    # stem — `es_body.py:32`; pipeline order lowercase -> stop -> stem).
    # Applies at BOTH index and query time (analyze_texts(stem=...)). The
    # stemmer follows `language`: Porter for English (default), Snowball
    # de/es/fr/ru/it/nl/pt/sv/no/da (`native/snowball.py`); others pass through
    # unstemmed with their stopword lists still applied (documented contract,
    # snowball.py docstring).
    stem: bool = False
    max_vocab: typ.Optional[int] = None
    section_template: str = "{{ title }} {{ content }}"
    # doc-shard the postings over a mesh axis (parity: ES under
    # `ShardedSearchClient`, reference `sharded_search.py:28`)
    sharded: bool = False
    shard_axis: str = "shard"

    def __add__(self, diff: typ.Optional[typ.Mapping | pydantic.BaseModel]) -> "SparseFactoryConfig":
        return apply_diff(self, diff)


class HybridSearchFactoryConfig(StrictModel):
    """Named engine bundle (parity: `HybridSearchFactoryConfig:286`)."""

    dense: typ.Optional[DenseFactoryConfig] = None
    sparse: typ.Optional[SparseFactoryConfig] = None

    @property
    def engines(self) -> dict[str, StrictModel]:
        out: dict[str, StrictModel] = {}
        if self.dense is not None:
            out["dense"] = self.dense
        if self.sparse is not None:
            out["sparse"] = self.sparse
        return out

    def __add__(self, diff: typ.Optional[typ.Mapping | pydantic.BaseModel]) -> "HybridSearchFactoryConfig":
        return apply_diff(self, diff)


class SearchFactoryDefaults(StrictModel):
    """Per-backend defaults + per-dataset diffs (parity: `search.py:310-337`)."""

    dense: DenseFactoryConfig = DenseFactoryConfig()
    sparse: SparseFactoryConfig = SparseFactoryConfig()

    def realize(self, diff: typ.Optional[typ.Mapping[str, typ.Any]] = None) -> HybridSearchFactoryConfig:
        """Build the hybrid config = defaults merged with a per-dataset diff.

        diff example: {"dense": {"codec": "pq"}, "sparse": None} (None disables).
        """
        diff = dict(diff or {})
        engines: dict[str, typ.Any] = {}
        for name, default in (("dense", self.dense), ("sparse", self.sparse)):
            if name in diff and diff[name] is None:
                engines[name] = None
            else:
                engines[name] = apply_diff(default, diff.get(name))
        return HybridSearchFactoryConfig(**engines)
