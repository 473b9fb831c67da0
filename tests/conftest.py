"""Test harness config: force an 8-device virtual CPU mesh.

Per SURVEY.md SS4.2 the CI strategy is CPU-only: kernels run through the
XLA CPU backend / Pallas interpret mode, and multi-chip sharding tests use
``--xla_force_host_platform_device_count``. This must run before jax is
imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
