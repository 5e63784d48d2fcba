"""Property-based trust-invariant tests (hypothesis).

Fuzzes random observation sequences against the design invariants the
reference states as its contract (reference platform/README.md:58-64):
1 explicit failures dominate, 2 ML influence is penalty-only and bounded,
3 temporal memory is dt-based, 4 policy is deterministic from thresholds.
The reference itself has no such tests (SURVEY.md §4) — this is the test
pyramid it lacks.
"""

import hypothesis.strategies as st
from hypothesis import given, settings

from fav_tpu.config import (
    POLICY_ALLOWED,
    POLICY_BLOCKED,
    POLICY_DECLINING,
    POLICY_DEGRADED,
    STATUS_OK,
    TrustParams,
)
from fav_tpu.core.trust import initial_trust_state, trust_step

P = TrustParams()

observations = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # status code
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),  # anomaly
        st.floats(min_value=1e-4, max_value=0.5, allow_nan=False),  # dt
    ),
    min_size=1,
    max_size=200,
)


def _run(seq, state=None):
    s = state or initial_trust_state(P)
    states = []
    for status, anomaly, dt in seq:
        s = trust_step(P, s, status, anomaly, dt)
        states.append(s)
    return states


@settings(max_examples=60, deadline=None)
@given(observations)
def test_reliability_always_bounded(seq):
    for s in _run(seq):
        assert 0.0 <= s.reliability <= 1.0
        assert 0.0 <= s.recovery_debt <= P.debt_max
        assert s.anomaly_integral >= 0.0
        assert P.recovery_min_coeff <= s.recovery_coeff <= P.recovery_rate


@settings(max_examples=60, deadline=None)
@given(observations)
def test_policy_is_pure_function_of_thresholds(seq):
    """Invariant 4: policy derives from (reliability, velocity) alone."""
    for s in _run(seq):
        r, v = s.reliability, s.trust_velocity
        if r >= P.allowed_threshold and v < P.declining_velocity:
            assert s.policy == POLICY_DECLINING
        elif r >= P.allowed_threshold:
            assert s.policy == POLICY_ALLOWED
        elif r >= P.degraded_threshold:
            assert s.policy == POLICY_DEGRADED
        else:
            assert s.policy == POLICY_BLOCKED


@settings(max_examples=60, deadline=None)
@given(observations)
def test_determinism(seq):
    """Same sequence -> identical trajectory (no hidden state/clock)."""
    a = _run(seq)
    b = _run(seq)
    for sa, sb in zip(a, b):
        assert sa == sb


@settings(max_examples=40, deadline=None)
@given(observations, st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_ml_penalty_only_during_ok(seq, anomaly):
    """Invariant 2: during steady OK ticks, a HIGHER anomaly score can never
    yield HIGHER reliability (ML is penalty-only)."""
    base = _run(seq)[-1]
    lo = trust_step(P, base, STATUS_OK, 0.0, 0.033)
    # need one more tick with same status for dynamics (transition ticks skip)
    lo = trust_step(P, lo, STATUS_OK, 0.0, 0.033)
    hi = trust_step(P, base, STATUS_OK, 0.0, 0.033)
    hi = trust_step(P, hi, STATUS_OK, anomaly, 0.033)
    assert hi.reliability <= lo.reliability + 1e-12


@settings(max_examples=40, deadline=None)
@given(observations)
def test_failures_never_raise_reliability(seq):
    """Invariant 1: a steady failure-status tick never increases reliability."""
    base = _run(seq)[-1]
    for status in (1, 2, 3):
        anchored = trust_step(P, base, status, 0.5, 0.033)  # may be transition
        after = trust_step(P, anchored, status, 0.5, 0.033)  # steady tick
        assert after.reliability <= anchored.reliability + 1e-12


@settings(max_examples=40, deadline=None)
@given(st.floats(min_value=1e-3, max_value=0.2), st.integers(min_value=2, max_value=40))
def test_dt_scaling_consistency(dt, n):
    """Invariant 3 (temporal memory): decay depends on elapsed time, so n
    steady FROZEN ticks of dt lose ~decay*n*dt reliability (exact: linear)."""
    s = initial_trust_state(P)
    s = trust_step(P, s, STATUS_OK, None, dt)
    s = trust_step(P, s, 1, None, dt)  # transition tick (no dynamics)
    start = s.reliability
    for _ in range(n):
        s = trust_step(P, s, 1, None, dt)
    expected = max(0.0, start - P.decay_frozen * n * dt)
    assert abs(s.reliability - expected) < 1e-9
