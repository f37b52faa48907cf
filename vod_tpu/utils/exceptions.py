"""Exception dumping for background workers.

Parity: reference `vod_tools/misc/exceptions.py:14` (`dump_exceptions_to_file` —
writes stack + args to `.exceptions/` so crashes in mp workers are diagnosable).
"""

from __future__ import annotations

import datetime
import functools
import pathlib
import traceback
import typing as typ

F = typ.TypeVar("F", bound=typ.Callable)


def dump_exceptions_to_file(fn: F, directory: str | pathlib.Path = ".exceptions") -> F:
    """Decorator: on exception, dump traceback + call args to a file, re-raise."""

    @functools.wraps(fn)
    def wrapper(*args: typ.Any, **kwargs: typ.Any) -> typ.Any:
        try:
            return fn(*args, **kwargs)
        except Exception as exc:
            d = pathlib.Path(directory)
            d.mkdir(parents=True, exist_ok=True)
            stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S-%f")
            path = d / f"{fn.__qualname__}-{stamp}.txt"
            try:
                path.write_text(
                    f"exception: {exc!r}\n\nargs: {args!r}\nkwargs: {kwargs!r}\n\n"
                    + traceback.format_exc()
                )
            except Exception:
                pass
            raise

    return typ.cast(F, wrapper)
