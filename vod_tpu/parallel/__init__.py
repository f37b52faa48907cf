"""Mesh + sharding helpers (replaces Lightning Fabric DDP/FSDP, reference
`src/vod_exps/init.py:40-84`)."""

from .mesh import fsdp_sharding, make_mesh, shard_batch, shard_params

__all__ = ["fsdp_sharding", "make_mesh", "shard_batch", "shard_params"]
