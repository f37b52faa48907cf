"""Runtime: device collate, train/val loops, trainer state, predict pipeline,
benchmarks, checkpoints (parity: reference `src/vod_ops/`)."""

from .collate import DeviceCorpus, QueryBatch, device_collate
from .state import ParameterSchedule, TrainerState
from .train import RealmTrainStep, make_train_step, training_loop, validation_loop
from .predict import compute_embeddings
from .benchmark import benchmark_retrieval

__all__ = [
    "DeviceCorpus",
    "ParameterSchedule",
    "QueryBatch",
    "RealmTrainStep",
    "TrainerState",
    "benchmark_retrieval",
    "compute_embeddings",
    "device_collate",
    "make_train_step",
    "training_loop",
    "validation_loop",
]
