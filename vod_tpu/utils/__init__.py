"""Shared tools (parity: reference `src/vod_tools/`): content fingerprinting,
jinja templates, artifact cache, CLI args, exception dumps, pretty printing."""

from .fingerprint import fingerprint, fingerprint_dataset, fingerprint_params, fingerprint_tokenizer
from .template import Template
from .cache import CacheManager, cached_artifact_path
from .arguantic import Arguantic
from .exceptions import dump_exceptions_to_file
from .jit_guard import JitLiteralError, assert_no_big_consts, closed_const_bytes, guarded_jit

__all__ = [
    "Arguantic",
    "CacheManager",
    "JitLiteralError",
    "Template",
    "assert_no_big_consts",
    "cached_artifact_path",
    "closed_const_bytes",
    "dump_exceptions_to_file",
    "guarded_jit",
    "fingerprint",
    "fingerprint_dataset",
    "fingerprint_params",
    "fingerprint_tokenizer",
]
