"""Shared tools (parity: reference `src/vod_tools/`): content fingerprinting,
jinja templates, artifact cache, CLI args, exception dumps, pretty printing."""

from .fingerprint import fingerprint, fingerprint_dataset, fingerprint_params, fingerprint_tokenizer
from .template import Template
from .cache import CacheManager, cached_artifact_path
from .arguantic import Arguantic
from .exceptions import dump_exceptions_to_file

__all__ = [
    "Arguantic",
    "CacheManager",
    "Template",
    "cached_artifact_path",
    "dump_exceptions_to_file",
    "fingerprint",
    "fingerprint_dataset",
    "fingerprint_params",
    "fingerprint_tokenizer",
]
