"""TPU-native search engines (replaces reference `src/vod_search/` — faiss dense
MIPS, Elasticsearch BM25, Qdrant — with device-resident JAX indexes)."""

from .base import SearchQueries, subset_mask
from .dense import (
    DenseIndex,
    IVFIndex,
    PQIndex,
    build_dense_index,
    build_ivf_index,
    build_pq_index,
    build_pq_index_from_host,
)
from .maxsim import MaxSimIndex, build_maxsim_index, maxsim_rerank, maxsim_search
from .sharded import ShardedMaxSimIndex, shard_maxsim_index, sharded_maxsim_rerank
from .ivfpq import (
    IVFPQIndex,
    build_ivfpq_from_device_parts,
    build_ivfpq_from_parts,
    build_ivfpq_index,
    ivfpq_search,
)
from .lookup import lookup_search
from .sharded import (
    ShardedDenseIndex,
    ShardedIVFPQIndex,
    shard_ivfpq_index,
    sharded_ivfpq_search,
    ShardedPQIndex,
    ShardedSparseIndex,
    build_sharded_dense_index,
    shard_pq_index,
    shard_sparse_index,
    sharded_dense_search,
    sharded_pq_search,
    sharded_sparse_search,
)
from .dynamic import (
    DynamicDenseIndex,
    dynamic_add,
    dynamic_compact,
    dynamic_delete,
    dynamic_from_dense,
    dynamic_index_init,
    dynamic_search,
    dynamic_update,
)
from .sparse import (
    SparseIndex,
    build_impact_index,
    build_sparse_index,
    build_sparse_index_native,
    sparse_search,
)
from .autotune import (
    OperatingPoint,
    apply_runtime_params,
    autotune,
    autotune_after_build,
    pareto_front,
    select_operating_point,
    sweep_operating_points,
)
from .hybrid import HybridEngines, hybrid_search_and_sample, hybrid_search

__all__ = [
    "DenseIndex",
    "IVFIndex",
    "IVFPQIndex",
    "HybridEngines",
    "PQIndex",
    "SearchQueries",
    "ShardedDenseIndex",
    "ShardedIVFPQIndex",
    "ShardedPQIndex",
    "ShardedSparseIndex",
    "SparseIndex",
    "build_dense_index",
    "build_ivf_index",
    "build_ivfpq_from_device_parts",
    "build_ivfpq_from_parts",
    "build_ivfpq_index", "MaxSimIndex", "ShardedMaxSimIndex", "shard_maxsim_index", "sharded_maxsim_rerank", "build_maxsim_index", "maxsim_rerank", "maxsim_search",
    "ivfpq_search",
    "build_pq_index",
    "OperatingPoint", "apply_runtime_params", "autotune", "autotune_after_build", "pareto_front",
    "select_operating_point", "sweep_operating_points",
    "build_pq_index_from_host",
    "build_sharded_dense_index",
    "DynamicDenseIndex",
    "dynamic_add",
    "dynamic_compact",
    "dynamic_delete",
    "dynamic_from_dense",
    "dynamic_index_init",
    "dynamic_search",
    "dynamic_update",
    "build_impact_index",
    "build_sparse_index",
    "build_sparse_index_native",
    "hybrid_search",
    "hybrid_search_and_sample",
    "lookup_search",
    "shard_pq_index",
    "shard_sparse_index",
    "sharded_dense_search",
    "sharded_ivfpq_search",
    "shard_ivfpq_index",
    "sharded_pq_search",
    "sharded_sparse_search",
    "sparse_search",
    "subset_mask",
]
