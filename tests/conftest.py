"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-device sharding tests use XLA's host-platform device-count override — the
TPU-native analog of a fake distributed backend (the reference has no distributed
tests at all; see SURVEY.md §4).

Must set env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# This jax build's default matmul precision downcasts inputs to bf16 even on
# CPU; tests compare against float64 numpy oracles, so force full precision.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
