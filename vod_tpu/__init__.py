"""vod_tpu — a TPU-native framework for retrieval-augmented language model training.

Capabilities mirror the reference VodLM/vod framework (see SURVEY.md), re-designed
program-first for TPU: corpus embeddings and search indexes are sharded JAX arrays in
HBM; search, score merging, priority sampling, and the REALM objective run inside one
jitted / shard_map-ed XLA program.
"""

__version__ = "0.1.0"

# Top-level convenience namespaces (lazy: importing vod_tpu stays cheap).
_SUBMODULES = (
    "configs", "data", "dataloaders", "exps", "models", "native", "ops",
    "parallel", "runtime", "search", "serving", "types", "utils",
)


def __getattr__(name: str):
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f"vod_tpu.{name}")
    raise AttributeError(f"module 'vod_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
