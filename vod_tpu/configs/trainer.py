"""Trainer / benchmark / batch-size / system configs.

Parity: reference `vod_configs/trainer.py` — `TrainerConfig:14` (max_steps,
period, val_check_interval, accumulate_grad_batches, gradient_clip_val,
per-engine `parameters` schedules, metrics, checkpoint_path),
`BenchmarkConfig:42`, `BatchSizeConfig:66`, `SysConfig:75`.
"""

from __future__ import annotations

import typing as typ

import pydantic

from .base import StrictModel


class ScheduleConfig(StrictModel):
    """Scalar schedule (parity: `utils/schedule.py:10`)."""

    mode: typ.Literal["constant", "linear", "step", "exponential"] = "constant"
    value: float = 1.0
    start: float = 0.0
    period: int = 1000
    offset: int = 0

    def instantiate(self):
        from vod_tpu.runtime.state import ParameterSchedule

        return ParameterSchedule(**self.model_dump())


class BenchmarkConfig(StrictModel):
    metrics: list[str] = pydantic.Field(
        default_factory=lambda: ["ndcg_10", "mrr_10", "hitrate_3", "recall_50"]
    )
    on_init: bool = False
    n_max_queries: typ.Optional[int] = None
    top_k: int = 100


class BatchSizeConfig(StrictModel):
    """Effective batch size accounting (parity `trainer.py:66` + the hydra
    accumulation resolver `resolvers.py:111`)."""

    effective: int = 32
    per_device: int = 8

    def accumulation_steps(self, n_devices: int) -> int:
        return max(1, -(-self.effective // (n_devices * self.per_device)))


class LRScheduleConfig(StrictModel):
    """Learning-rate schedule (parity: reference hydra `model/scheduler/`:
    `linear.yaml` = warmup+linear decay, `cycle.yaml` = one-cycle/cosine)."""

    kind: typ.Literal["constant", "linear", "cosine"] = "linear"
    warmup_steps: int = 0
    decay_steps: typ.Optional[int] = None  # default: trainer.max_steps
    end_factor: float = 0.0  # final lr = end_factor * learning_rate

    def instantiate(self, learning_rate: float, max_steps: int):
        import optax

        decay = self.decay_steps if self.decay_steps is not None else max_steps
        if self.kind == "constant":
            if self.warmup_steps:
                return optax.linear_schedule(0.0, learning_rate, self.warmup_steps)
            return learning_rate
        if self.kind == "linear":
            return optax.join_schedules(
                [
                    optax.linear_schedule(0.0, learning_rate, max(1, self.warmup_steps)),
                    optax.linear_schedule(
                        learning_rate, learning_rate * self.end_factor, max(1, decay - self.warmup_steps)
                    ),
                ],
                [self.warmup_steps],
            )
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, self.warmup_steps, decay, learning_rate * self.end_factor
        )


class TrainerConfig(StrictModel):
    max_steps: int = 1_000
    period: typ.Optional[int] = None
    val_check_interval: typ.Optional[int] = None
    log_interval: int = 50
    accumulate_grad_batches: int = 1
    gradient_clip_val: typ.Optional[float] = None
    # GradCache (Gao et al. 2021, beyond reference): chunk the fused encoder
    # pass at `chunk_rows` rows so activation memory is ONE chunk's, enabling
    # beyond-HBM effective batch sizes; exact gradients. Ranker-only.
    gradcache_chunk_rows: typ.Optional[int] = None
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    optimizer: typ.Literal["adamw", "adafactor", "sgd"] = "adamw"
    lr_schedule: typ.Optional[LRScheduleConfig] = None
    parameters: dict[str, ScheduleConfig] = pydantic.Field(default_factory=dict)
    metrics: list[str] = pydantic.Field(default_factory=lambda: ["mrr", "ndcg_10", "hitrate_3"])
    checkpoint_path: typ.Optional[str] = None
    benchmark: BenchmarkConfig = BenchmarkConfig()
    batch_size: BatchSizeConfig = BatchSizeConfig()


class SysConfig(StrictModel):
    seed: int = 0
    cache_dir: typ.Optional[str] = None
    profile_dir: typ.Optional[str] = None  # jax.profiler trace output dir
    mesh_shape: list[int] = pydantic.Field(default_factory=lambda: [-1])
    mesh_axes: list[str] = pydantic.Field(default_factory=lambda: ["dp"])
