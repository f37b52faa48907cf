"""Pydantic + argparse mini-CLI (parity: reference `vod_tools/arguantic/arguantic.py:7`)."""

from __future__ import annotations

import argparse
import typing as typ

import pydantic


class Arguantic(pydantic.BaseModel):
    """Subclass with typed fields; `.parse()` reads them from argv."""

    model_config = pydantic.ConfigDict(extra="forbid")

    @classmethod
    def parse(cls, args: typ.Optional[list[str]] = None) -> "Arguantic":
        parser = argparse.ArgumentParser(description=cls.__doc__)
        for name, field in cls.model_fields.items():
            default = field.default if field.default is not None else None
            ann = field.annotation
            if ann is bool:
                parser.add_argument(f"--{name}", type=lambda x: x.lower() in ("1", "true", "yes"), default=default)
            elif ann in (int, float, str):
                parser.add_argument(f"--{name}", type=ann, default=default)
            else:
                parser.add_argument(f"--{name}", type=str, default=default)
        ns = parser.parse_args(args)
        return cls(**vars(ns))
