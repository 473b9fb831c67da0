"""Test harness config: force an 8-device virtual CPU mesh.

Per SURVEY.md §4.2 the CI strategy is CPU-only: kernels run through the
XLA CPU backend / Pallas interpret mode, and multi-chip sharding tests use
``--xla_force_host_platform_device_count``. The sandbox's sitecustomize pins
``jax_platforms`` to the axon TPU tunnel regardless of env vars, so we must
override via jax.config *before* the backend initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
