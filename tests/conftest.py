"""Test harness config: run JAX on 8 virtual CPU devices so every sharded
code path (mesh, pjit, collectives) is exercised without TPU hardware."""

import os
import sys

# Must be set before jax import anywhere in the test process. Force CPU:
# the test suite validates sharding on 8 virtual devices; bench.py covers TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

# Trust math parity requires float64 on the JAX host path.
jax.config.update("jax_enable_x64", True)
