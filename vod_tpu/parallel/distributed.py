"""Multi-process (multi-host) execution: jax.distributed + per-process data.

Parity: the reference trains multi-node via Lightning Fabric launchers —
`vod_exps/init.py:40-85` builds DDP/FSDP strategies over torch.distributed
(NCCL), ranks stride the dataset via `fabric.setup_dataloaders`
(`workflows/predict/compute.py:91`), and rank-0 guards artifact builds with
barriers (`helpers.py:38-47`). The TPU equivalent is one plane:
`jax.distributed.initialize` joins the processes, `jax.devices()` becomes the
GLOBAL device list (so `make_mesh` spans hosts transparently — ICI within a
host/pod slice, DCN across), and per-process data feeding assembles global
arrays from process-local shards with `jax.make_array_from_process_local_data`.

Orbax checkpointing is multihost-safe once jax.distributed is initialized
(every process participates in `save`; orbax coordinates the commit).
"""

from __future__ import annotations

import os
import typing as typ

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator: typ.Optional[str] = None,
    num_processes: typ.Optional[int] = None,
    process_id: typ.Optional[int] = None,
    local_device_ids: typ.Optional[typ.Sequence[int]] = None,
) -> tuple[int, int]:
    """Join the process group. Returns (process_index, process_count).

    With no arguments this is a no-op in single-process mode (returns (0, 1))
    unless the standard env vars are set — `JAX_COORDINATOR_ADDRESS`,
    `JAX_NUM_PROCESSES`, `JAX_PROCESS_ID` — or JAX can auto-detect the cluster
    (TPU pod metadata). Mirrors the reference CLI's fabric launch
    (`vod_exps/train.py:62-63`), minus the process spawning: each process runs
    the same entrypoint with its own `--process_id` (SPMD, like `torchrun`).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator is None and (num_processes is None or num_processes <= 1):
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    """Rank-0 check (parity: `fabric.is_global_zero` / `distributed.py:4`)."""
    return jax.process_index() == 0


def process_slice(n: int, process_index: typ.Optional[int] = None) -> slice:
    """This process's contiguous row range of an n-row dataset (parity: DDP
    ranks striding the predict dataset, `predict/compute.py:91-115`; contiguous
    blocks instead of strides so tensorstore/host IO stays sequential)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count()
    per = -(-n // pc)
    return slice(pi * per, min((pi + 1) * per, n))


def global_batch_from_local(
    local: typ.Any,  # numpy/jax array, this process's batch rows
    mesh: Mesh,
    spec: P = P("dp"),
) -> jax.Array:
    """Assemble a global dp-sharded array from per-process local rows.

    Each process passes its OWN rows (global_batch = concat over processes in
    process order); returns the global jax.Array sharded per `spec` over the
    multi-host mesh. This replaces the reference's DistributedSampler +
    per-rank DataLoader (`workflows/train.py:99-104`).
    """
    return jax.make_array_from_process_local_data(NamedSharding(mesh, spec), np.asarray(local))


def barrier(name: str = "barrier") -> None:
    """Cross-process sync point (parity: `barrier_fn`, `helpers.py:38-47`)."""
    if jax.process_count() == 1:
        return
    # a tiny psum over all devices is the canonical jax barrier
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
