"""The driver contract (__graft_entry__.py) must keep working: entry()
compiles single-device; dryrun_multichip jits the full ensemble train step
over an 8-device mesh and executes one step."""

import jax
import pytest


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out["confidence"].shape == (256,)
    assert out["prediction"].dtype.kind == "i"
    assert float(out["anomaly"].min()) >= 0.0


def test_dryrun_multichip_eight():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on any sharding/compile failure


def test_dryrun_multichip_rejects_too_many():
    import __graft_entry__ as ge

    with pytest.raises(RuntimeError):
        ge.dryrun_multichip(jax.device_count() + 1)
