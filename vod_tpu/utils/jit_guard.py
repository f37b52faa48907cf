"""Structural guard against the remote-relay literal trap.

A `jax.jit`-ed function that CLOSES OVER a device array embeds it in the
compiled program as a literal constant. On this environment's remote-compile
relay, literals ship at ~100 s/MB per compiled program (measured round 4: one
closed-over 2.3 MB array = 252 s compile; the same array passed as a jit
ARGUMENT = 1.6 s), and such programs sporadically stall for minutes. Round 4
fixed every known site point-by-point (bench.py, the 8.8M examples, the
host-slab builders); this module makes the pattern structurally detectable so
the next big-array closure fails a test instead of silently re-introducing
minute-long compiles.

Usage:
    from vod_tpu.utils.jit_guard import assert_no_big_consts, guarded_jit

    assert_no_big_consts(fn, *example_args)      # test-time audit
    f = guarded_jit(fn)                          # checks on first trace, then jits

The check walks the closed jaxpr's `consts` — exactly the closure-captured
values XLA will bake into the program — and fails when their total size
exceeds `limit_bytes` (default 1 MB: small lookup tables are fine, index
shards are not).
"""

from __future__ import annotations

import typing as typ

import jax
import numpy as np

__all__ = ["JitLiteralError", "closed_const_bytes", "assert_no_big_consts", "guarded_jit"]

_DEFAULT_LIMIT = 1 << 20  # 1 MB


class JitLiteralError(RuntimeError):
    """A jitted function closes over array constants big enough to stall the
    remote-compile relay. Pass the arrays as jit ARGUMENTS instead."""


def _const_nbytes(c: typ.Any) -> int:
    nbytes = getattr(c, "nbytes", None)
    if nbytes is not None:
        return int(nbytes)
    shape = getattr(c, "shape", None)
    if shape is not None:
        itemsize = getattr(getattr(c, "dtype", None), "itemsize", 8)
        return int(np.prod(shape)) * int(itemsize) if shape else int(itemsize)
    return 8  # python scalar


def closed_const_bytes(
    fn: typ.Callable, *args: typ.Any, **kwargs: typ.Any
) -> tuple[int, list[tuple[str, int]]]:
    """Total bytes of closure-captured constants `fn` would bake into its
    compiled program when traced with `args`/`kwargs`.

    Returns `(total_bytes, [(description, nbytes), ...])` sorted biggest-first.
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    sizes = []
    for c in closed.consts:
        desc = f"{getattr(c, 'dtype', type(c).__name__)}{list(getattr(c, 'shape', []))}"
        sizes.append((desc, _const_nbytes(c)))
    sizes.sort(key=lambda t: -t[1])
    return sum(s for _, s in sizes), sizes


def assert_no_big_consts(
    fn: typ.Callable,
    *args: typ.Any,
    limit_bytes: int = _DEFAULT_LIMIT,
    name: typ.Optional[str] = None,
    **kwargs: typ.Any,
) -> None:
    """Raise `JitLiteralError` if tracing `fn(*args, **kwargs)` captures more
    than `limit_bytes` of closure constants (the relay-literal trap)."""
    total, sizes = closed_const_bytes(fn, *args, **kwargs)
    if total > limit_bytes:
        offenders = ", ".join(f"{d}={s/2**20:.2f}MB" for d, s in sizes[:5] if s > 0)
        raise JitLiteralError(
            f"{name or getattr(fn, '__name__', repr(fn))} closes over "
            f"{total/2**20:.2f} MB of array constants (limit "
            f"{limit_bytes/2**20:.2f} MB): {offenders}. The remote-compile "
            f"relay ships program literals at ~100 s/MB — pass these arrays "
            f"as jit ARGUMENTS instead of closing over them."
        )


def guarded_jit(
    fn: typ.Callable,
    *,
    limit_bytes: int = _DEFAULT_LIMIT,
    **jit_kwargs: typ.Any,
) -> typ.Callable:
    """`jax.jit` that audits closure constants on the FIRST call per input
    structure (one extra trace — no extra compile), then dispatches normally.

    Intended for examples/bench code where a new closure can silently appear;
    library search paths already take their indexes as arguments."""
    jitted = jax.jit(fn, **jit_kwargs)
    checked = False

    def wrapper(*args: typ.Any, **kwargs: typ.Any):
        nonlocal checked
        if not checked:
            assert_no_big_consts(fn, *args, limit_bytes=limit_bytes, **kwargs)
            checked = True
        return jitted(*args, **kwargs)

    wrapper.__wrapped__ = fn  # type: ignore[attr-defined]
    return wrapper
