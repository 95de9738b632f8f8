"""Test config: CPU backend with 8 virtual devices (multi-chip sharding tests
run on a host-platform mesh, per the TPU-build test strategy in SURVEY.md §4)."""

import os
import sys

# force, don't setdefault: the shell may carry a TPU platform setting
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Env vars alone are not enough: the axon TPU plugin in this image grabs the
# backend regardless of late JAX_PLATFORMS changes; the programmatic config
# reliably pins tests to the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-bound (every variant config
# specializes kernels); re-runs hit the cache and finish in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
