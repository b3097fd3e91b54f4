"""Test configuration: virtual 8-device CPU mesh + full-precision matmuls.

Multi-device sharding tests use a virtual CPU device mesh — the TPU-native
analog of a fake distributed backend (the reference has no distributed tests at
all; see SURVEY.md §4).

NOTE: the axon site hook (PYTHONPATH=/root/.axon_site sitecustomize) imports
jax at interpreter startup, so JAX_PLATFORMS / XLA_FLAGS env vars set here are
already snapshotted and have NO effect. Everything must go through
``jax.config.update`` (works until backends are instantiated).
"""

import jax

jax.config.update("jax_platforms", "cpu")        # don't run unit tests on TPU
jax.config.update("jax_num_cpu_devices", 8)      # virtual mesh for dist tests

# This jax build's default matmul precision downcasts inputs to bf16 even on
# CPU; tests compare against float64 numpy oracles, so force full precision.
jax.config.update("jax_default_matmul_precision", "highest")

# Cache compiled executables across test runs (each small jit costs seconds on
# this host otherwise).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
