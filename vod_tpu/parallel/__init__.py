"""Mesh + sharding helpers (replaces Lightning Fabric DDP/FSDP, reference
`src/vod_exps/init.py:40-84`)."""

from .distributed import (
    barrier,
    global_batch_from_local,
    init_distributed,
    is_main_process,
    process_slice,
)
from .moe import MoEFFN, ep_sharding, shard_params_ep
from .pipeline import pipeline_apply, pp_encoder_forward, stack_pipeline_stages
from .ring import ring_attention, sp_encoder_forward
from .mesh import combined_sharding, fsdp_sharding, make_mesh, shard_batch, shard_params, shard_params_combined, shard_params_tp, tp_sharding

__all__ = ["barrier", "combined_sharding", "global_batch_from_local", "init_distributed", "is_main_process", "process_slice", "fsdp_sharding", "MoEFFN", "ep_sharding", "shard_params_ep", "pipeline_apply", "pp_encoder_forward", "stack_pipeline_stages", "ring_attention", "sp_encoder_forward", "make_mesh", "shard_batch", "shard_params", "shard_params_combined", "shard_params_tp", "tp_sharding"]
