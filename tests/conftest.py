"""Test harness config: run JAX on 8 virtual CPU devices so every sharded
code path (mesh, pjit, collectives) is exercised without TPU hardware."""

import os
import sys

# Force CPU with 8 virtual devices: the test suite validates sharding without
# TPU hardware; bench.py covers TPU. NOTE: a site hook may import jax (and
# register a TPU plugin) before this file runs, so setting the JAX_PLATFORMS
# env var here is too late — use jax.config.update, which wins as long as no
# backend has been initialized yet. XLA_FLAGS is read from the live process
# env at CPU-client creation, so mutating os.environ works for it.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests may spawn

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Trust math parity requires float64 on the JAX host path.
jax.config.update("jax_enable_x64", True)
# Compiles dominate suite runtime (training smokes build many small
# programs); the persistent cache cuts re-runs dramatically.
_CACHE = os.path.join(REPO_ROOT, ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: anything not marked `slow` is `fast`, so both
    `pytest -m fast` (quick per-commit gate) and `pytest -m "not slow"` work."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
