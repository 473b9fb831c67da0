"""Test harness config: force an 8-device virtual CPU mesh.

Per SURVEY.md §4.2 the CI strategy is CPU-only: kernels run through the
XLA CPU backend / Pallas interpret mode, and multi-chip sharding tests use
``--xla_force_host_platform_device_count``. The sandbox's sitecustomize pins
``jax_platforms`` to the axon TPU tunnel regardless of env vars, so we must
override via jax.config *before* the backend initializes.
"""
import atexit
import os
import shutil
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# Isolate the persistent XLA compile cache per test run: concurrent
# writers can corrupt a shared cache file, and a corrupted entry
# SEGFAULTS jax on read (observed 2026-08-18). Tests compile fast on CPU;
# cross-run reuse is not worth the hazard.
_cache_dir = tempfile.mkdtemp(prefix="rrx_jax_test_")
os.environ["RRX_COMPILE_CACHE"] = _cache_dir
atexit.register(shutil.rmtree, _cache_dir, True)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_state():
    """Drop jit/executable caches after each test module: the XLA CPU
    compiler has been observed to segfault late in a long single-process
    run (hundreds of accumulated executables), and per-module clearing
    bounds that state at negligible recompile cost."""
    yield
    gc.collect()
    jax.clear_caches()
