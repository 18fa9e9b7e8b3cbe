"""Test environment: CPU backend with 8 virtual devices.

Tests must not depend on the single real TPU chip (each TPU compile goes
through a tunnel and costs ~20s); multi-device sharding tests use the
virtual CPU mesh (SURVEY.md §4.7).

This environment preloads jax via a sitecustomize that pins the axon TPU
platform, so the env-var route (JAX_PLATFORMS=cpu) is already consumed by
the time pytest starts; jax.config.update still works because no backend
has been initialized yet when conftest imports.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
