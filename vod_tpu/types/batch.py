"""Typed batches for retrieval-augmented training.

Parity: reference `src/vod_types/batch.py` — `RealmBatch` (`batch.py:69`) defines the
full training-batch schema, `RealmOutput` (`batch.py:107`) the model output. Here both
are flax pytree dataclasses so they pass through `jit`/`pjit` directly (the reference
registers torch pytrees for torch.distributed, `batch.py:117-129`).

Field naming follows the reference's `<group>__<name>` convention so downstream code
(gradients, monitors, pretty-printers) reads identically.
"""

from __future__ import annotations

import typing as typ

import jax
from flax import struct


@struct.dataclass
class RealmBatch:
    """A tokenized batch for retrieval-augmented tasks (parity: `batch.py:69-104`).

    Shapes (B = batch, D = sections per query, Lq/Ls/Lm = sequence lengths):
      query__*            : [B, Lq]
      section__input_ids  : [B*D, Ls] (flattened section tokens)
      section__{score,...}: [B, D]
      lm__*               : [B, D, Lm]
    """

    # Query tokenized text
    query__input_ids: jax.Array
    query__attention_mask: jax.Array
    # Section tokenized text
    section__input_ids: jax.Array
    section__attention_mask: jax.Array
    # Retrieval label & scores
    section__relevance: jax.Array  # [B, D] int/float labels (>0 = positive)
    section__idx: jax.Array  # [B, D] global section row ids
    section__score: jax.Array  # [B, D] merged hybrid score (-inf = padding)
    section__sparse: jax.Array  # [B, D] raw sparse-engine score (nan = missing)
    section__dense: typ.Optional[jax.Array] = None  # [B, D] raw dense score
    # Cross-encoder teacher scores for distillation (beyond reference):
    # [B, D], -inf/nan where missing; see `models.gradients.DistillationGradients`
    section__teacher_score: typ.Optional[jax.Array] = None
    # Priority sampling
    section__log_weight: typ.Optional[jax.Array] = None  # [B, D]
    section__lse_pos: typ.Optional[jax.Array] = None  # [B]
    section__lse_neg: typ.Optional[jax.Array] = None  # [B]
    # Language-model tokenized text (REALM reader; None for pure rankers)
    lm__input_ids: typ.Optional[jax.Array] = None
    lm__attention_mask: typ.Optional[jax.Array] = None
    lm__token_type_ids: typ.Optional[jax.Array] = None  # 0/1/2 = context/question/answer
    # Non-tensor extras (host-side metadata; not traced)
    extras: dict = struct.field(pytree_node=False, default_factory=dict)
    diagnostics: dict = struct.field(pytree_node=False, default_factory=dict)

    def get(self, key: str, default: typ.Any = None) -> typ.Any:
        return getattr(self, key, default)

    def __getitem__(self, key: str) -> typ.Any:
        return getattr(self, key)


@struct.dataclass
class RealmOutput:
    """Model output (parity: `batch.py:107-114`)."""

    loss: jax.Array
    retriever_scores: jax.Array  # [B, D]
    diagnostics: dict = struct.field(pytree_node=False, default_factory=dict)
