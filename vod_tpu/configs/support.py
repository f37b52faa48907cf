"""Tweaks + sectioning configs.

Parity: reference `vod_configs/support.py` — `TweaksConfig:10` (torch.compile /
grad checkpointing / kbit / LoRA / dtype force) and the sectioning configs
(`SentenceSectioningConfig:42`, `FixedLengthSectioningConfig:49`).

TPU mapping: torch.compile -> jit (always on); gradient checkpointing ->
`jax.checkpoint` (remat) over encoder layers; kbit/LoRA -> parameter-efficient
masks (LoRA planned); force_dtype -> activation dtype of the encoder config.
"""

from __future__ import annotations

import typing as typ

from .base import StrictModel


class TweaksConfig(StrictModel):
    remat: bool = False  # jax.checkpoint over transformer layers
    force_dtype: typ.Optional[str] = None  # activation dtype override
    donate_state: bool = True  # donate params/opt_state buffers in the step
    # QLoRA-style kbit training is wired through `ModelConfig.kbit` (the CLI
    # runs models/kbit.kbit_prepare and optimizes the trainable subset only;
    # parity: `prepare_for_kbit_training`, reference `vod_models/support.py:30`).


class SentenceSectioningConfig(StrictModel):
    mode: typ.Literal["sentence"] = "sentence"
    delimiter: str = ". "


class FixedLengthSectioningConfig(StrictModel):
    mode: typ.Literal["fixed_length"] = "fixed_length"
    section_length: int = 200
    stride: typ.Optional[int] = None
    ellipsis_start: str = "(...) "
    ellipsis_end: str = " (...)"
    tokenizer_name_or_path: str = "bert-base-uncased"
