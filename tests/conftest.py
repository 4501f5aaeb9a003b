"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices (same XLA partitioner, same
collectives).

NOTE: this machine's sitecustomize registers a tunneled TPU backend and
force-sets jax_platforms='axon,cpu' at interpreter startup, so the usual
JAX_PLATFORMS env var is ignored — we must override the config back to cpu
*after* import (and before any backend is instantiated).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: CPU test-suite compiles dominate wall time.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
