"""Root conftest: make the repo importable and force a virtual multi-device CPU mesh.

Tests exercise multi-chip sharding logic (shard_map / pjit over a Mesh) on a virtual
8-device CPU backend, as real multi-chip TPU hardware is not available in CI.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
