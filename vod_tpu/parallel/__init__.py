"""Mesh + sharding helpers (replaces Lightning Fabric DDP/FSDP, reference
`src/vod_exps/init.py:40-84`)."""

from .mesh import combined_sharding, fsdp_sharding, make_mesh, shard_batch, shard_params, shard_params_combined, shard_params_tp, tp_sharding

__all__ = ["combined_sharding", "fsdp_sharding", "make_mesh", "shard_batch", "shard_params", "shard_params_combined", "shard_params_tp", "tp_sharding"]
