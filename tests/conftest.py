"""Test env: force the CPU backend with 8 virtual devices (before jax use).

This is the standard JAX trick for exercising Mesh/pjit sharding without TPU
hardware (SURVEY.md §4). NOTE: in this environment the axon TPU plugin wins
over the JAX_PLATFORMS *env var*, so the override must go through
``jax.config`` — the env var alone is silently ignored.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
