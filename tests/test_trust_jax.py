"""JAX trust-scan parity vs the host float64 engine, plus scan/vmap mechanics."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.config import POLICY_NAMES, STATUS_CODES, TrustParams
from fav_tpu.core.trust import TrustEngine
from fav_tpu.core.trust_jax import init_carry, simulate_batch, simulate_sequence

PARAMS = TrustParams()
STATUSES = ["VISION_OK", "VISION_FROZEN", "VISION_BLANK", "VISION_CORRUPTED"]


def random_scenario(seed, n):
    rng = random.Random(seed)
    statuses, anomalies, has_a, dts = [], [], [], []
    for _ in range(n):
        # runs of the same status so dynamics ticks actually occur
        status = rng.choice(STATUSES)
        for _ in range(rng.randint(1, 40)):
            statuses.append(STATUS_CODES[status])
            if rng.random() < 0.9:
                anomalies.append(rng.random() * 0.08)
                has_a.append(True)
            else:
                anomalies.append(0.0)
                has_a.append(False)
            dts.append(rng.uniform(0.01, 0.1))
    return (
        np.array(statuses, np.int32),
        np.array(anomalies, np.float64),
        np.array(has_a, bool),
        np.array(dts, np.float64),
    )


def host_trajectory(statuses, anomalies, has_a, dts):
    engine = TrustEngine(PARAMS)
    out = []
    for s, a, h, dt in zip(statuses, anomalies, has_a, dts):
        st = engine.update(
            ["VISION_OK", "VISION_FROZEN", "VISION_BLANK", "VISION_CORRUPTED"][s],
            float(a) if h else None,
            float(dt),
        )
        out.append(st)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scan_matches_host_engine(seed):
    statuses, anomalies, has_a, dts = random_scenario(seed, 60)
    host = host_trajectory(statuses, anomalies, has_a, dts)

    carry = init_carry(PARAMS, dtype=jnp.float64)
    _, outs = simulate_sequence(
        PARAMS, jnp.asarray(statuses), jnp.asarray(anomalies), jnp.asarray(has_a), jnp.asarray(dts), carry
    )

    rel = np.asarray(outs.reliability)
    pol = np.asarray(outs.policy)
    integ = np.asarray(outs.anomaly_integral)
    vel = np.asarray(outs.trust_velocity)
    debt = np.asarray(outs.recovery_debt)
    contra = np.asarray(outs.contradiction)
    ccount = np.asarray(outs.contradiction_count)

    for i, h in enumerate(host):
        assert rel[i] == pytest.approx(h["reliability"], abs=5e-7), f"tick {i}"
        assert POLICY_NAMES[pol[i]] == h["policy_state"], f"tick {i}"
        assert integ[i] == pytest.approx(h["anomaly_integral"], abs=5e-7), f"tick {i}"
        assert vel[i] == pytest.approx(h["trust_velocity"], abs=5e-6), f"tick {i}"
        assert debt[i] == pytest.approx(h["recovery_debt"], abs=5e-5), f"tick {i}"
        assert bool(contra[i]) == h["contradiction_detected"], f"tick {i}"
        assert int(ccount[i]) == h["contradiction_count"], f"tick {i}"


def test_golden_scenario_through_scan():
    """BASELINE.md golden values through the JAX path at dt = 1/30."""
    dt = 1.0 / 30.0
    seq = [(0, 0.019, True)] + [(1, 0.019, True)] * 50 + [(2, 0.0, False)] * 30 \
        + [(3, 0.0, False)] * 100 + [(0, 0.019, True)] * 200
    statuses = jnp.asarray([s for s, _, _ in seq], jnp.int32)
    anomalies = jnp.asarray([a for _, a, _ in seq], jnp.float64)
    has_a = jnp.asarray([h for _, _, h in seq])
    dts = jnp.full((len(seq),), dt, jnp.float64)

    _, outs = simulate_sequence(PARAMS, statuses, anomalies, has_a, dts, init_carry(PARAMS))
    rel = np.asarray(outs.reliability)
    assert rel[50] == pytest.approx(0.510000, abs=1e-6)  # after FROZEN x50
    assert rel[80] == pytest.approx(0.0, abs=1e-9)  # after BLANK x30
    assert rel[180] == pytest.approx(0.0, abs=1e-9)  # after CORRUPTED x100
    assert rel[380] == pytest.approx(0.504917, abs=1e-6)  # after OK x200
    assert np.asarray(outs.anomaly_integral)[380] == pytest.approx(0.036049, abs=1e-6)
    assert np.asarray(outs.recovery_debt)[380] == pytest.approx(2.8183 - 200 / 30 * 0.10 + dt * 0.10, abs=1e-3)


def test_batch_vmap_independent_streams():
    """vmapped streams must match per-stream scans exactly."""
    dt = 1.0 / 30.0
    T, B = 120, 4
    rng = np.random.default_rng(0)
    statuses = rng.integers(0, 4, (B, T)).astype(np.int32)
    anomalies = rng.random((B, T)) * 0.05
    has_a = np.ones((B, T), bool)
    dts = np.full((B, T), dt)

    batch = simulate_batch(PARAMS, jnp.asarray(statuses), jnp.asarray(anomalies), jnp.asarray(has_a), jnp.asarray(dts))
    for b in range(B):
        _, single = simulate_sequence(
            PARAMS,
            jnp.asarray(statuses[b]),
            jnp.asarray(anomalies[b]),
            jnp.asarray(has_a[b]),
            jnp.asarray(dts[b]),
            init_carry(PARAMS),
        )
        np.testing.assert_allclose(np.asarray(batch.reliability)[b], np.asarray(single.reliability), atol=1e-12)
        np.testing.assert_array_equal(np.asarray(batch.policy)[b], np.asarray(single.policy))


def test_carry_resume_equals_single_scan():
    """Splitting a sequence across two scans must equal one scan (checkpointability)."""
    statuses, anomalies, has_a, dts = random_scenario(9, 30)
    j = len(statuses) // 2
    full_carry = init_carry(PARAMS)
    _, full = simulate_sequence(
        PARAMS, jnp.asarray(statuses), jnp.asarray(anomalies), jnp.asarray(has_a), jnp.asarray(dts), full_carry
    )
    mid, first = simulate_sequence(
        PARAMS, jnp.asarray(statuses[:j]), jnp.asarray(anomalies[:j]), jnp.asarray(has_a[:j]), jnp.asarray(dts[:j]), init_carry(PARAMS)
    )
    _, second = simulate_sequence(
        PARAMS, jnp.asarray(statuses[j:]), jnp.asarray(anomalies[j:]), jnp.asarray(has_a[j:]), jnp.asarray(dts[j:]), mid
    )
    np.testing.assert_allclose(
        np.concatenate([np.asarray(first.reliability), np.asarray(second.reliability)]),
        np.asarray(full.reliability),
        atol=1e-12,
    )
