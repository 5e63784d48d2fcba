"""Trust engine — branchless JAX implementation for on-device batch replay.

Same recurrence as :mod:`fav_tpu.core.trust` (parity target
``platform/backend/trust_engine.py``), re-expressed in XLA-friendly form:

* no data-dependent Python control flow — every branch of the reference
  (first tick / status change / OK dynamics / failure dynamics) becomes a
  ``jnp.where`` lattice over disjoint masks, so one compiled program handles
  every tick,
* the contradiction detector's rolling 60-sample list
  (trust_engine.py:60-62,105-129) becomes a fixed-shape ring buffer carried
  through ``lax.scan`` (mean/stdev are order-invariant, so ring == FIFO),
* time is an explicit ``dt`` input (the playground already runs fixed
  dt = 1/30, main.py:339), making trajectories deterministic and
  batch-replayable,
* ``vmap`` over the carry gives many independent trust streams (one per
  video/connection/corruption cell) in a single device program; the scan
  axis is time.

This is the TPU-side path used by the playground batch endpoint, corruption
sweeps, and any training-in-the-loop use. The host float64 path remains the
serving default for single streams.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fav_tpu.config import STATUS_OK, STATUS_UNSET, TrustParams

__all__ = ["TrustCarry", "init_carry", "trust_step_jax", "simulate_sequence", "simulate_batch"]


class TrustCarry(NamedTuple):
    """Fixed-shape trust state for scan/vmap. Dtypes set by :func:`init_carry`."""

    reliability: jax.Array
    anomaly_integral: jax.Array
    status: jax.Array  # int32, STATUS_UNSET before first observation
    trust_velocity: jax.Array
    prev_reliability: jax.Array
    recovery_debt: jax.Array
    recovery_coeff: jax.Array
    contradiction: jax.Array  # bool
    contradiction_count: jax.Array  # int32
    tick_count: jax.Array  # int32
    buf_status: jax.Array  # int32[window]
    buf_score: jax.Array  # float[window]
    buf_count: jax.Array  # int32 — filled entries
    buf_pos: jax.Array  # int32 — ring write cursor


class TrustOutputs(NamedTuple):
    """Per-tick observable state (wire-schema numeric fields)."""

    reliability: jax.Array
    policy: jax.Array  # int32 policy code
    anomaly_integral: jax.Array
    trust_velocity: jax.Array
    recovery_debt: jax.Array
    recovery_coeff: jax.Array
    contradiction: jax.Array
    contradiction_count: jax.Array
    status: jax.Array
    tick_count: jax.Array


def init_carry(params: TrustParams | None = None, dtype=jnp.float64) -> TrustCarry:
    p = params or TrustParams()
    w = p.contra_window
    f = functools.partial(jnp.asarray, dtype=dtype)
    return TrustCarry(
        reliability=f(1.0),
        anomaly_integral=f(0.0),
        status=jnp.int32(STATUS_UNSET),
        trust_velocity=f(0.0),
        prev_reliability=f(1.0),
        recovery_debt=f(0.0),
        recovery_coeff=f(p.recovery_rate),
        contradiction=jnp.asarray(False),
        contradiction_count=jnp.int32(0),
        tick_count=jnp.int32(0),
        buf_status=jnp.full((w,), STATUS_UNSET, jnp.int32),
        buf_score=jnp.zeros((w,), dtype),
        buf_count=jnp.int32(0),
        buf_pos=jnp.int32(0),
    )


def _gate_policy(p: TrustParams, reliability, velocity):
    """Policy code from thresholds (trust_engine.py:79-86)."""
    declining = (reliability >= p.allowed_threshold) & (velocity < p.declining_velocity)
    allowed = reliability >= p.allowed_threshold
    degraded = reliability >= p.degraded_threshold
    # ALLOWED=0 DECLINING=1 DEGRADED=2 BLOCKED=3
    return jnp.where(
        declining,
        jnp.int32(1),
        jnp.where(allowed, jnp.int32(0), jnp.where(degraded, jnp.int32(2), jnp.int32(3))),
    )


def trust_step_jax(
    params: TrustParams,
    carry: TrustCarry,
    status,
    anomaly,
    has_anomaly,
    dt,
) -> tuple[TrustCarry, TrustOutputs]:
    """One branchless trust tick. All args may be traced values."""
    p = params
    c = carry
    dtype = c.reliability.dtype
    status = jnp.asarray(status, jnp.int32)
    anomaly = jnp.asarray(anomaly, dtype)
    has_anomaly = jnp.asarray(has_anomaly, bool)
    dt = jnp.asarray(dt, dtype)

    tick = c.tick_count + 1
    is_first = c.status == STATUS_UNSET
    is_change = jnp.logical_and(~is_first, status != c.status)
    dyn = jnp.logical_and(~is_first, ~is_change)

    # integral zeroed on OK -> failure transition (trust_engine.py:167-169)
    integral0 = jnp.where(
        is_change & (status != STATUS_OK) & (c.status == STATUS_OK),
        jnp.zeros((), dtype),
        c.anomaly_integral,
    )

    is_ok = status == STATUS_OK

    # ── OK branch (trust_engine.py:179-200) ──
    debt_ok = jnp.maximum(0.0, c.recovery_debt - p.debt_drain * dt)
    coeff_ok = jnp.maximum(p.recovery_min_coeff, p.recovery_rate - p.debt_gain * debt_ok)
    integral_ok = jnp.where(
        has_anomaly,
        jnp.maximum(0.0, (integral0 + anomaly * dt) * (1.0 - p.ml_leak * dt)),
        integral0,
    )
    penalty = jnp.where(has_anomaly, p.ml_gain * integral_ok * dt, jnp.zeros((), dtype))
    rel_ok = c.reliability + coeff_ok * dt - penalty

    # ── failure branch (trust_engine.py:202-224) ──
    rates = jnp.asarray([0.0, p.decay_frozen, p.decay_blank, p.decay_corrupted], dtype)
    decay = rates[jnp.clip(status, 0, 3)]
    debt_fail = jnp.minimum(
        p.debt_max, c.recovery_debt + jnp.maximum(0.0, p.allowed_threshold - c.reliability) * dt
    )
    rel_fail = c.reliability - decay * dt

    rel_new = jnp.clip(jnp.where(is_ok, rel_ok, rel_fail), 0.0, 1.0)
    debt_new = jnp.where(is_ok, debt_ok, debt_fail)
    coeff_new = jnp.where(is_ok, coeff_ok, c.recovery_coeff)
    integral_new = jnp.where(is_ok, integral_ok, jnp.zeros((), dtype))

    raw_velocity = (rel_new - c.prev_reliability) / jnp.maximum(dt, p.velocity_dt_floor)
    vel_new = p.velocity_alpha * raw_velocity + (1.0 - p.velocity_alpha) * c.trust_velocity

    # ── merge dynamics under the dyn mask ──
    reliability = jnp.where(dyn, rel_new, c.reliability)
    anomaly_integral = jnp.where(dyn, integral_new, integral0)
    recovery_debt = jnp.where(dyn, debt_new, c.recovery_debt)
    recovery_coeff = jnp.where(dyn, coeff_new, c.recovery_coeff)
    trust_velocity = jnp.where(dyn, vel_new, c.trust_velocity)
    prev_reliability = jnp.where(dyn, reliability, c.prev_reliability)

    # ── contradiction detector (trust_engine.py:92-137) ──
    do_append = dyn & has_anomaly
    pos = c.buf_pos
    buf_status = jnp.where(
        do_append, c.buf_status.at[pos].set(status), c.buf_status
    )
    buf_score = jnp.where(do_append, c.buf_score.at[pos].set(anomaly), c.buf_score)
    buf_count = jnp.minimum(p.contra_window, c.buf_count + do_append.astype(jnp.int32))
    buf_pos = jnp.where(do_append, (pos + 1) % p.contra_window, pos)

    idx = jnp.arange(p.contra_window)
    valid = idx < buf_count
    same = valid & (buf_status == status)
    n_same = jnp.sum(same)
    n_safe = jnp.maximum(n_same, 1)
    mean = jnp.sum(jnp.where(same, buf_score, 0.0)) / n_safe
    var = jnp.sum(jnp.where(same, (buf_score - mean) ** 2, 0.0)) / jnp.maximum(n_safe - 1, 1)
    std = jnp.maximum(jnp.sqrt(var), p.contra_std_floor)
    z = (anomaly - mean) / std

    eligible = (buf_count >= p.contra_min_total) & (n_same >= p.contra_min_status)
    hit = do_append & eligible & (status == STATUS_OK) & (z > p.contra_z)
    contradiction = jnp.where(dyn, hit, c.contradiction)
    contradiction_count = c.contradiction_count + (hit & ~c.contradiction).astype(jnp.int32)

    policy = _gate_policy(p, reliability, trust_velocity)

    new_carry = TrustCarry(
        reliability=reliability,
        anomaly_integral=anomaly_integral,
        status=status,
        trust_velocity=trust_velocity,
        prev_reliability=prev_reliability,
        recovery_debt=recovery_debt,
        recovery_coeff=recovery_coeff,
        contradiction=contradiction,
        contradiction_count=contradiction_count,
        tick_count=tick,
        buf_status=buf_status,
        buf_score=buf_score,
        buf_count=buf_count,
        buf_pos=buf_pos,
    )
    outputs = TrustOutputs(
        reliability=reliability,
        policy=policy,
        anomaly_integral=anomaly_integral,
        trust_velocity=trust_velocity,
        recovery_debt=recovery_debt,
        recovery_coeff=recovery_coeff,
        contradiction=contradiction,
        contradiction_count=contradiction_count,
        status=status,
        tick_count=tick,
    )
    return new_carry, outputs


@functools.partial(jax.jit, static_argnums=0)
def simulate_sequence(
    params: TrustParams,
    statuses: jax.Array,
    anomalies: jax.Array,
    has_anomaly: jax.Array,
    dts: jax.Array,
    carry: TrustCarry | None = None,
) -> tuple[TrustCarry, TrustOutputs]:
    """Replay a whole observation sequence as one ``lax.scan`` (time axis).

    This is the TPU-native analog of the reference playground loop
    (main.py:334-352): the entire event sequence compiles to a single device
    program instead of a Python per-tick loop.
    """
    if carry is None:
        carry = init_carry(params, dtype=jnp.result_type(anomalies.dtype, jnp.float32))

    def step(c, xs):
        status, anomaly, has_a, dt = xs
        return trust_step_jax(params, c, status, anomaly, has_a, dt)

    return jax.lax.scan(step, carry, (statuses, anomalies, has_anomaly, dts))


@functools.partial(jax.jit, static_argnums=0)
def simulate_batch(
    params: TrustParams,
    statuses: jax.Array,  # [B, T] int32
    anomalies: jax.Array,  # [B, T]
    has_anomaly: jax.Array,  # [B, T] bool
    dts: jax.Array,  # [B, T]
) -> TrustOutputs:
    """Many independent trust streams at once: vmap over batch, scan over time.

    Used for corruption sweeps where every (corruption, severity) cell carries
    its own trust trajectory.
    """

    def one(st, an, ha, dt):
        _, outs = simulate_sequence(params, st, an, ha, dt)
        return outs

    return jax.vmap(one)(statuses, anomalies, has_anomaly, dts)
