"""Policy-space replay (fav_tpu/core/policy_replay.py): the scan replay is
pinned against the pure host engine (core/trust.py), the host anomaly mirror
is pinned against the device formula, and grid_policy's stream composition
is checked on constructed streams. Anchor: the reference's policy output
(reference trust_engine.py:73-90) and batch replay (reference main.py:334-352).
"""

import numpy as np
import pytest

from fav_tpu.config import POLICY_NAMES, TrustParams
from fav_tpu.core.policy_replay import (
    POLICY_TICKS_DEFAULT,
    anomaly_from_confidence_np,
    grid_policy,
    replay_policy,
)
from fav_tpu.core.trust import initial_trust_state, trust_step

PARAMS = TrustParams()
DT = 1.0 / 30.0


def test_np_anomaly_mirror_matches_device_formula():
    from fav_tpu.models.uncertainty import anomaly_from_confidence

    conf = np.linspace(0.0, 1.0, 257, dtype=np.float32)
    dev = np.asarray(anomaly_from_confidence(conf), np.float32)
    host = anomaly_from_confidence_np(conf)
    np.testing.assert_array_equal(host, dev)


def test_replay_pinned_against_host_engine():
    """Per-tick policy and final reliability of the scan replay must equal a
    pure-Python trust_step loop on the same streams."""
    rng = np.random.default_rng(3)
    n, t = 5, 200
    statuses = rng.integers(0, 4, (n, t)).astype(np.int32)
    anomalies = (rng.random((n, t)) * 0.8).astype(np.float64)

    rows = replay_policy(statuses, anomalies, PARAMS, DT)
    for i in range(n):
        state = initial_trust_state(PARAMS)
        policies = []
        for k in range(t):
            state = trust_step(PARAMS, state, int(statuses[i, k]),
                               float(anomalies[i, k]), DT)
            policies.append(state.policy)
        policies = np.asarray(policies)
        for code, name in enumerate(POLICY_NAMES):
            assert rows[i][f"policy_share_{name.lower()}"] == pytest.approx(
                float(np.mean(policies == code)), abs=1e-12
            )
        blocked = np.nonzero(policies == 3)[0]
        want_ttb = float((blocked[0] + 1) * DT) if blocked.size else -1.0
        assert rows[i]["time_to_blocked_s"] == pytest.approx(want_ttb, abs=1e-9)
        assert rows[i]["final_reliability"] == pytest.approx(
            state.reliability, abs=1e-9
        )
        assert rows[i]["contradictions"] == state.contradiction_count


def test_all_ok_baseline_stays_allowed():
    st = np.zeros((1, 300), np.int32)
    an = np.full((1, 300), 0.019)
    (row,) = replay_policy(st, an, PARAMS, DT, wrong=np.zeros((1, 300)))
    assert row["policy_share_vision_allowed"] == 1.0
    assert row["time_to_blocked_s"] == -1.0
    assert row["allowed_wrong_share"] == 0.0
    assert row["min_reliability"] >= PARAMS.allowed_threshold


def test_blank_stream_blocks_within_seconds():
    """BLANK decays reliability at decay_blank; BLOCKED must arrive in a few
    seconds and dominate a 30 s stream (the fast explicit-status path)."""
    st = np.full((1, POLICY_TICKS_DEFAULT), 2, np.int32)
    an = np.zeros((1, POLICY_TICKS_DEFAULT))
    (row,) = replay_policy(st, an, PARAMS, DT)
    assert 0.0 < row["time_to_blocked_s"] < 6.0
    assert row["policy_share_vision_blocked"] > 0.7
    assert row["min_reliability"] == 0.0


def test_allowed_wrong_share_counts_only_allowed_ticks():
    """A stream that runs OK-wrong then collapses: the blind-spot share must
    count only the ALLOWED ticks, not the whole wrong stretch."""
    t = 300
    st = np.concatenate([np.zeros(150, np.int32), np.full(150, 2, np.int32)])
    an = np.concatenate([np.full(150, 0.019), np.zeros(150)])
    wrong = np.ones(t)
    (row,) = replay_policy(st[None], an[None], PARAMS, DT, wrong=wrong[None])
    # first 150 ticks: ALLOWED and wrong; afterwards BLANK collapses policy
    assert row["allowed_wrong_share"] == pytest.approx(
        row["policy_share_vision_allowed"], abs=1e-12
    )
    assert 0.3 < row["allowed_wrong_share"] < 0.7


def test_grid_policy_composes_serving_stream():
    """Constructed rows: the composed anomaly is max(l1, model) with the
    operative confidence min-gated when mon_conf is present."""
    cells = (("a", 1), ("b", 5))
    b = 64
    rows = {
        # cell 0: L1 quiet, model confident -> pure ALLOWED
        # cell 1: L1 CORRUPTED on every sample -> collapses
        "l1_status": np.stack([np.zeros(b, np.int32), np.full(b, 3, np.int32)]),
        "l1_anomaly": np.stack([np.zeros(b, np.float32), np.full(b, 0.9, np.float32)]),
        "conf": np.full((2, b), 0.95, np.float32),
        "correct": np.stack([np.ones(b, np.float32), np.zeros(b, np.float32)]),
    }
    out = grid_policy(cells, rows, ticks=240)
    assert out[0]["policy_share_vision_allowed"] == 1.0
    assert out[0]["allowed_wrong_share"] == 0.0
    assert out[1]["time_to_blocked_s"] > 0
    # min-gating: a collapsed monitor must raise the model anomaly leg even
    # where L1 is quiet — cell 0 now leaves ALLOWED via the integral path
    rows_gated = dict(rows, mon_conf=np.full((2, b), 0.05, np.float32))
    gated = grid_policy(cells, rows_gated, ticks=240)
    assert gated[0]["policy_share_vision_allowed"] < 1.0
    assert gated[0]["min_reliability"] < out[0]["min_reliability"]


def test_grid_policy_tiles_short_batches():
    cells = (("a", 1),)
    b = 7
    rows = {
        "l1_status": np.zeros((1, b), np.int32),
        "l1_anomaly": np.zeros((1, b), np.float32),
        "conf": np.full((1, b), 0.9, np.float32),
        "correct": np.ones((1, b), np.float32),
    }
    out = grid_policy(cells, rows, ticks=50)
    assert out[0]["policy_share_vision_allowed"] == 1.0


def test_monitored_sweep_rows_feed_grid_policy():
    """The run_policy.sh composition end-to-end at the sweep level: a
    monitored fused sweep's return_rows feed grid_policy, and min-gating by
    a weak monitor can only lower the reliability floor (anomaly is
    monotone in the operative-confidence deficit)."""
    import jax
    import jax.numpy as jnp

    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import synthetic_cifar10
    from fav_tpu.models.cnn import create_model
    from fav_tpu.parallel.sweep import fused_sweep

    model = create_model(ModelParams(widths=(8, 16), dense_width=16))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    mon = create_model(ModelParams(widths=(4, 8), dense_width=8))
    mon_params = mon.init(jax.random.PRNGKey(4), jnp.zeros((1, 32, 32, 3)))
    ds = synthetic_cifar10(train_size=8, test_size=64, seed=4)
    x, y = jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    want_rows = ("l1_status", "l1_anomaly", "conf", "correct", "mon_conf")
    results, cells, rows = fused_sweep(
        model.apply, params, x, y, jax.random.PRNGKey(17),
        ("contrast",), (2, 5), temperature=1.1,
        monitor=(mon.apply, mon_params, 0.9), return_rows=want_rows,
    )
    assert set(rows) == set(want_rows)
    pol = grid_policy(cells, rows, ticks=90)
    assert len(pol) == len(cells)
    ungated = grid_policy(
        cells, {k: v for k, v in rows.items() if k != "mon_conf"}, ticks=90
    )
    for gated_row, plain_row in zip(pol, ungated):
        assert gated_row["min_reliability"] <= plain_row["min_reliability"] + 1e-9
        shares = sum(
            gated_row[f"policy_share_{s.lower()}"] for s in POLICY_NAMES
        )
        assert shares == pytest.approx(1.0, abs=1e-9)


@pytest.mark.slow
def test_evaluate_cli_policy_smoke(tmp_path):
    """evaluate --policy on a 2-corruption subset: per-cell policy columns
    join the grid and the summary carries the policy block."""
    from fav_tpu.models import evaluate

    result = evaluate.main(
        ["--num-images", "64", "--train-steps", "0",
         "--corruptions", "gaussian_noise,brightness", "--widths", "8,16",
         "--checkpoint", str(tmp_path / "nonexistent"),
         "--policy", "--policy-ticks", "120"]
    )
    pol = result["summary"]["policy"]
    assert pol["ticks"] == 120
    shares = [pol[f"mean_share_{s}"] for s in
              ("vision_allowed", "vision_declining", "vision_degraded",
               "vision_blocked")]
    assert sum(shares) == pytest.approx(1.0, abs=1e-3)
    cell = result["grid"]["gaussian_noise"][5]
    assert "time_to_blocked_s" in cell and "allowed_wrong_share" in cell
    assert 0.0 <= cell["policy_share_vision_allowed"] <= 1.0
