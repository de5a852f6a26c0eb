"""Test env: force the CPU backend with 8 virtual devices (before jax import).

This is the standard JAX trick for exercising Mesh/pjit sharding without TPU
hardware (SURVEY.md §4). Must run before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
