"""Root conftest: make the repo importable and force a virtual multi-device CPU mesh.

Tests exercise multi-chip sharding logic (shard_map / pjit over a Mesh) on a virtual
8-device CPU backend; real multi-chip TPU hardware is not available in CI.

Note: this environment's sitecustomize imports jax in every interpreter (so env-var
tricks in conftest are too late for JAX_PLATFORMS), but backends initialize lazily —
`jax.config.update` before the first device use still wins. XLA_FLAGS is read at
CPU-client creation, which is also lazy.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

# zero-egress environment: fail fast instead of hanging on hub downloads
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("HF_DATASETS_OFFLINE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache (VERDICT r4 #5: the suite costs ~22 min on a
# 1-core box, almost all of it XLA-CPU compiles). Keys hash the optimized HLO +
# backend config, so correctness is safe; a warm cache replays a 0.7 s compile
# in ~0.01 s (measured). Cold first run seeds it; every later run — including
# re-runs while iterating — pays only trace+execute time. Env override:
# VOD_TEST_CACHE_DIR=, empty string disables.
_cache_dir = os.environ.get("VOD_TEST_CACHE_DIR", "/tmp/jaxcache-tests")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert len(jax.devices()) == 8, (
    f"expected the 8-device virtual CPU mesh, got {jax.devices()}; "
    "was a backend initialized before conftest ran?"
)
