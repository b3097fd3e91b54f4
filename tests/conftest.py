"""Test configuration: virtual 8-device CPU mesh + full-precision matmuls.

Multi-device sharding tests use XLA's host-platform device-count override — the
TPU-native analog of a fake distributed backend (the reference has no distributed
tests at all; see SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (env vars above must be set first)

# This jax build's default matmul precision downcasts inputs to bf16 even on
# CPU; tests compare against float64 numpy oracles, so force full precision.
# (Set via config, not env var: the site hook pre-imports jax._src.config.)
jax.config.update("jax_default_matmul_precision", "highest")

# Cache compiled executables across test runs (each small jit costs seconds on
# this host otherwise).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
