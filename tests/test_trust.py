"""Trust-core golden parity + invariant property tests.

Golden values are the measured behavior of the reference implementation
(``platform/backend/trust_engine.py`` driven by its ``test_trust.py``
scenario at dt = 0.033) as pinned in BASELINE.md.
"""

import math
import random

import pytest

from fav_tpu.config import TrustParams
from fav_tpu.core.trust import TrustEngine, initial_trust_state, trust_step
from fav_tpu.sim.anomaly_sim import AnomalySimulator

DT = 1.0 / 30.0  # BASELINE.md golden values were measured at fixed dt = 1/30


def run_reference_scenario(engine: TrustEngine):
    """OK x1, FROZEN x50, BLANK x30, CORRUPTED x100, OK x200 (reference test_trust.py:9-31)."""
    checkpoints = {}
    checkpoints["ok1"] = engine.update("VISION_OK", 0.019, DT)
    for _ in range(50):
        s = engine.update("VISION_FROZEN", 0.019, DT)
    checkpoints["frozen50"] = s
    for _ in range(30):
        s = engine.update("VISION_BLANK", None, DT)
    checkpoints["blank30"] = s
    for _ in range(100):
        s = engine.update("VISION_CORRUPTED", None, DT)
    checkpoints["corrupt100"] = s
    for _ in range(200):
        s = engine.update("VISION_OK", 0.019, DT)
    checkpoints["recover200"] = s
    return checkpoints


class TestGoldenParity:
    def test_reference_scenario(self):
        cp = run_reference_scenario(TrustEngine())

        assert cp["ok1"]["reliability"] == pytest.approx(1.0, abs=1e-9)
        assert cp["ok1"]["policy_state"] == "VISION_ALLOWED"

        assert cp["frozen50"]["reliability"] == pytest.approx(0.510000, abs=1e-6)
        assert cp["frozen50"]["policy_state"] == "VISION_DEGRADED"
        assert cp["frozen50"]["anomaly_integral"] == 0.0
        assert cp["frozen50"]["recovery_debt"] == pytest.approx(0.057, abs=1e-4)

        assert cp["blank30"]["reliability"] == pytest.approx(0.0, abs=1e-9)
        assert cp["blank30"]["policy_state"] == "VISION_BLOCKED"
        assert cp["blank30"]["recovery_debt"] == pytest.approx(0.5083, abs=1e-4)

        assert cp["corrupt100"]["reliability"] == pytest.approx(0.0, abs=1e-9)
        assert cp["corrupt100"]["policy_state"] == "VISION_BLOCKED"
        assert cp["corrupt100"]["recovery_debt"] == pytest.approx(2.8183, abs=1e-4)

        assert cp["recover200"]["reliability"] == pytest.approx(0.504917, abs=1e-6)
        assert cp["recover200"]["policy_state"] == "VISION_DEGRADED"
        assert cp["recover200"]["anomaly_integral"] == pytest.approx(0.036049, abs=1e-6)
        assert cp["recover200"]["recovery_coeff"] == pytest.approx(0.0828, abs=1e-4)

    def test_steady_state_integral(self):
        """Leak equilibrium I* ~= a/leak (platform/README.md:45, trust_engine.py:195-199)."""
        engine = TrustEngine()
        engine.update("VISION_OK", 0.019, DT)
        for _ in range(5000):
            s = engine.update("VISION_OK", 0.019, DT)
        # discrete-time fixed point: I* = a*dt*(1-leak*dt)/(leak*dt)
        expected = 0.019 * DT * (1 - 0.5 * DT) / (0.5 * DT)
        assert s["anomaly_integral"] == pytest.approx(expected, rel=1e-3)

    def test_status_change_tick_skips_dynamics(self):
        """A status-change tick re-anchors without decay (trust_engine.py:161-171)."""
        engine = TrustEngine()
        engine.update("VISION_OK", 0.019, DT)
        before = engine.reliability
        s = engine.update("VISION_FROZEN", 0.019, DT)  # transition tick
        assert s["reliability"] == pytest.approx(round(before, 6))

    def test_integral_zeroed_on_ok_to_failure(self):
        engine = TrustEngine()
        engine.update("VISION_OK", 0.5, DT)
        for _ in range(100):
            engine.update("VISION_OK", 0.5, DT)
        assert engine.state.anomaly_integral > 0.0
        s = engine.update("VISION_BLANK", None, DT)
        assert s["anomaly_integral"] == 0.0


class TestInvariants:
    """The four design invariants (reference platform/README.md:58-64)."""

    @pytest.mark.parametrize("status", ["VISION_FROZEN", "VISION_BLANK", "VISION_CORRUPTED"])
    def test_explicit_failures_dominate(self, status):
        """ML is disabled during failures: anomaly value cannot change the trajectory."""
        runs = []
        for anomaly in (0.0, 1.0):
            engine = TrustEngine()
            engine.update("VISION_OK", 0.019, DT)
            for _ in range(60):
                s = engine.update(status, anomaly, DT)
            runs.append(s["reliability"])
        assert runs[0] == runs[1]

    def test_ml_penalty_only(self):
        """Anomaly can only lower reliability, never raise it (bounded ML)."""
        lo, hi = [], []
        for anomaly in (0.0, 0.9):
            engine = TrustEngine()
            engine.update("VISION_OK", anomaly, DT)
            traj = [engine.update("VISION_OK", anomaly, DT)["reliability"] for _ in range(300)]
            (lo if anomaly == 0.0 else hi).extend(traj)
        assert all(h <= l + 1e-12 for l, h in zip(lo, hi))

    def test_reliability_bounded(self):
        rng = random.Random(0)
        engine = TrustEngine()
        statuses = ["VISION_OK", "VISION_FROZEN", "VISION_BLANK", "VISION_CORRUPTED"]
        for _ in range(2000):
            s = engine.update(rng.choice(statuses), rng.random(), rng.uniform(0.001, 0.2))
            assert 0.0 <= s["reliability"] <= 1.0
            assert 0.0 <= s["recovery_debt"] <= 10.0
            assert s["recovery_coeff"] >= 0.03 - 1e-12

    def test_policy_deterministic_from_thresholds(self):
        engine = TrustEngine()
        rng = random.Random(1)
        statuses = ["VISION_OK", "VISION_FROZEN", "VISION_BLANK", "VISION_CORRUPTED"]
        for _ in range(1500):
            s = engine.update(rng.choice(statuses), rng.random() * 0.1, DT)
            r, v, p = s["reliability"], s["trust_velocity"], s["policy_state"]
            if r >= 0.7 and v < -0.15:
                assert p == "VISION_DECLINING"
            elif r >= 0.7:
                assert p == "VISION_ALLOWED"
            elif r >= 0.3:
                assert p == "VISION_DEGRADED"
            else:
                assert p == "VISION_BLOCKED"

    def test_recovery_slower_after_deeper_failure(self):
        """Asymmetric recovery: more debt -> slower climb (trust_engine.py:29-32)."""

        def recover_after(failure_ticks):
            engine = TrustEngine()
            engine.update("VISION_OK", 0.019, DT)
            for _ in range(failure_ticks):
                engine.update("VISION_CORRUPTED", None, DT)
            for _ in range(100):
                s = engine.update("VISION_OK", 0.019, DT)
            return s["reliability"]

        assert recover_after(40) > recover_after(400)


class TestContradictionDetector:
    def test_outlier_while_ok_flags(self):
        engine = TrustEngine()
        engine.update("VISION_OK", 0.019, DT)
        for _ in range(59):
            engine.update("VISION_OK", 0.019 + 0.0001 * math.sin(engine.state.tick_count), DT)
        s = engine.update("VISION_OK", 0.9, DT)  # massive outlier
        assert s["contradiction_detected"] is True
        assert s["contradiction_count"] == 1

    def test_count_rising_edge_only(self):
        engine = TrustEngine()
        engine.update("VISION_OK", 0.019, DT)
        for i in range(59):
            engine.update("VISION_OK", 0.019 + 0.0001 * ((i % 7) - 3), DT)
        engine.update("VISION_OK", 0.9, DT)
        s = engine.update("VISION_OK", 0.9, DT)
        # second outlier is part of the same contradiction episode
        assert s["contradiction_count"] == 1

    def test_needs_baseline_samples(self):
        engine = TrustEngine()
        engine.update("VISION_OK", 0.019, DT)
        for _ in range(10):
            s = engine.update("VISION_OK", 0.9, DT)
        assert s["contradiction_detected"] is False


class TestAnomalySimulator:
    def test_deterministic_with_seed(self):
        a = AnomalySimulator(seed=42)
        b = AnomalySimulator(seed=42)
        for status in ("VISION_OK", "VISION_FROZEN", "VISION_BLANK", "VISION_CORRUPTED"):
            assert a.compute_anomaly(0.3, 0.6, status) == b.compute_anomaly(0.3, 0.6, status)

    def test_matches_reference_distribution_model(self):
        """Status signatures (anomaly_simulator.py:49-77)."""
        sim = AnomalySimulator(seed=7)
        ok = [sim.compute_anomaly(0.0, 0.5, "VISION_OK") for _ in range(500)]
        assert abs(sum(ok) / len(ok) - 0.019) < 0.002

        sim.reset(7)
        blank = [sim.compute_anomaly(0.0, 0.5, "VISION_BLANK") for _ in range(500)]
        assert abs(sum(blank) / len(blank) - 0.005) < 0.002  # AE blind spot

        sim.reset(7)
        corrupted = [sim.compute_anomaly(0.5, 0.5, "VISION_CORRUPTED") for _ in range(500)]
        assert sum(corrupted) / len(corrupted) > 0.05

        # noise monotonicity at fixed seed position
        sim.reset(3)
        low = sim.compute_anomaly(0.0, 0.5, "VISION_OK")
        sim.reset(3)
        high = sim.compute_anomaly(1.0, 0.5, "VISION_OK")
        assert high > low

    def test_floor(self):
        sim = AnomalySimulator(seed=0)
        for _ in range(200):
            assert sim.compute_anomaly(0.0, 0.5, "VISION_FROZEN") >= 0.001


def test_pure_step_is_referentially_transparent():
    params = TrustParams()
    s0 = initial_trust_state(params)
    a = trust_step(params, s0, 0, 0.02, DT)
    b = trust_step(params, s0, 0, 0.02, DT)
    assert a == b
    assert s0.tick_count == 0  # input untouched
