"""Checkpoint save/load: params, optimizer state, trainer state.

Parity: reference `vod_ops/utils/io.py:15,45` (`fabric.save`/`load` of model /
optimizer / scheduler state-dicts + `TrainerState` JSON at every validation) —
here orbax for the array pytrees + JSON for the trainer state; resume restores
all three (reference `train.py:38-47` resume-from-dir).
"""

from __future__ import annotations

import pathlib
import typing as typ

import jax
import orbax.checkpoint as ocp

from .state import TrainerState


def save_checkpoint(
    directory: str | pathlib.Path,
    *,
    params: typ.Any,
    opt_state: typ.Any,
    state: TrainerState,
) -> None:
    directory = pathlib.Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(directory / "params", params, force=True)
        ckptr.save(directory / "opt_state", opt_state, force=True)
    state.save(directory / "trainer_state.json")


def load_checkpoint(
    directory: str | pathlib.Path,
    *,
    params_like: typ.Any,
    opt_state_like: typ.Any,
) -> tuple[typ.Any, typ.Any, TrainerState]:
    """Restore (params, opt_state, trainer_state); `*_like` give the pytree
    structure/shardings to restore into."""
    directory = pathlib.Path(directory).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(
            directory / "params", args=ocp.args.PyTreeRestore(item=params_like)
        )
        opt_state = ckptr.restore(
            directory / "opt_state", args=ocp.args.PyTreeRestore(item=opt_state_like)
        )
    state = TrainerState.load(directory / "trainer_state.json")
    return params, opt_state, state
