"""Config foundations.

Parity: reference `vod_configs/utils/base.py:6,17` — `StrictModel` (frozen,
extra=forbid) and the `AllowMutations` context manager — plus the generic
defaults+diff merge behind the reference's `config + diff` algebra
(`search.py:137,179,228,294,329`).
"""

from __future__ import annotations

import contextlib
import typing as typ

import pydantic

M = typ.TypeVar("M", bound=pydantic.BaseModel)


class StrictModel(pydantic.BaseModel):
    """Frozen, extra-forbidding pydantic base."""

    model_config = pydantic.ConfigDict(frozen=True, extra="forbid")


@contextlib.contextmanager
def AllowMutations(model: pydantic.BaseModel) -> typ.Iterator[pydantic.BaseModel]:
    """Temporarily lift the frozen flag (parity: `base.py:17`)."""
    original = model.model_config.get("frozen", False)
    object.__setattr__(model, "__pydantic_frozen__", False)
    try:
        yield model
    finally:
        object.__setattr__(model, "__pydantic_frozen__", bool(original))


def apply_diff(base: M, diff: typ.Optional[typ.Mapping[str, typ.Any] | pydantic.BaseModel]) -> M:
    """`base + diff`: non-None diff fields override base, recursively for nested
    models/dicts. Returns a new validated model."""
    if diff is None:
        return base
    if isinstance(diff, pydantic.BaseModel):
        diff = {k: v for k, v in diff.model_dump(exclude_unset=True).items()}
    merged = base.model_dump()

    def merge(dst: dict, src: typ.Mapping) -> None:
        for k, v in src.items():
            if v is None:
                continue
            if isinstance(v, typ.Mapping) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    merge(merged, diff)
    return type(base).model_validate(merged)
