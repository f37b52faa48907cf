"""Deterministic content fingerprints — the cache-key system.

Parity: reference `vod_tools/fingerprint/hashing.py` — hashes for tokenizers,
partials, datasets and model weights (state-dict serialization, `:68-80`) keying
the embedding/index caches (`predict/fingerprint.py:12`, `factory.py:146`).

Here model weights are jax pytrees: hashed by (path, shape, dtype, content
digest) per leaf — device arrays are pulled once per call, so fingerprint at
period boundaries, not per step.
"""

from __future__ import annotations

import hashlib
import json
import typing as typ

import numpy as np


def _update(h: "hashlib._Hash", obj: typ.Any) -> None:
    if obj is None:
        h.update(b"~none~")
    elif isinstance(obj, (str, int, float, bool)):
        h.update(repr(obj).encode())
    elif isinstance(obj, bytes):
        h.update(obj)
    elif isinstance(obj, dict):
        for k in sorted(obj, key=str):
            _update(h, str(k))
            _update(h, obj[k])
    elif isinstance(obj, (list, tuple)):
        for x in obj:
            _update(h, x)
    elif isinstance(obj, np.ndarray):
        h.update(str(obj.shape).encode())
        h.update(str(obj.dtype).encode())
        h.update(np.ascontiguousarray(obj).tobytes())
    elif hasattr(obj, "shape") and hasattr(obj, "dtype"):  # jax array
        _update(h, np.asarray(obj))
    elif callable(obj):
        h.update(getattr(obj, "__qualname__", repr(obj)).encode())
    else:
        h.update(repr(obj).encode())


def fingerprint(obj: typ.Any) -> str:
    """Deterministic 16-hex-char digest of (nested) python/numpy/jax content."""
    h = hashlib.blake2b(digest_size=8)
    _update(h, obj)
    return h.hexdigest()


def fingerprint_params(params: typ.Any) -> str:
    """Fingerprint a jax parameter pytree (parity: torch state-dict hashing)."""
    import jax

    leaves_with_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    h = hashlib.blake2b(digest_size=8)
    for path, leaf in leaves_with_paths:
        h.update(jax.tree_util.keystr(path).encode())
        _update(h, leaf)
    return h.hexdigest()


def fingerprint_dataset(dataset: typ.Any) -> str:
    """Fingerprint a HF dataset (uses its own fingerprint when available)."""
    fp = getattr(dataset, "_fingerprint", None)
    if fp:
        return fingerprint(fp)
    return fingerprint({"len": len(dataset), "first": dataset[0] if len(dataset) else None})


def fingerprint_tokenizer(tokenizer: typ.Any) -> str:
    """Fingerprint a HF tokenizer by vocab + special tokens + class."""
    try:
        vocab = tokenizer.get_vocab()
        spec = {
            "class": type(tokenizer).__name__,
            "vocab_size": len(vocab),
            "vocab_hash": fingerprint(json.dumps(sorted(vocab.items())[:1000])),
            "specials": str(getattr(tokenizer, "special_tokens_map", {})),
        }
    except Exception:
        spec = {"class": type(tokenizer).__name__, "repr": repr(tokenizer)}
    return fingerprint(spec)
