"""The driver contract (__graft_entry__.py) must keep working: entry()
compiles single-device; dryrun_multichip jits the full ensemble train step
over an 8-device mesh and executes one step."""

import jax
import pytest


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out["confidence"].shape == (256,)
    assert out["prediction"].dtype.kind == "i"
    assert float(out["anomaly"].min()) >= 0.0


@pytest.mark.slow
def test_dryrun_multichip_eight():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on any sharding/compile failure


def test_dryrun_multichip_rejects_too_many():
    import __graft_entry__ as ge

    with pytest.raises(RuntimeError):
        ge.dryrun_multichip(jax.device_count() + 1)


@pytest.mark.slow
def test_dryrun_multichip_cold_subprocess():
    """Reproduce the driver's cold invocation: a fresh interpreter with NO
    JAX env vars (conftest must not mask the entry point's own platform
    forcing — round-1's MULTICHIP artifact went red exactly this way)."""
    import os
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-3000:]}"
