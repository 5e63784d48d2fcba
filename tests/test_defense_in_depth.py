"""System-level defense-in-depth composition (BENCH.md "Defense in depth").

The multi-draw study measured that model confidence — intrinsic, gated, or
ensembled — fails on hostile draws exactly on luminance/contrast physics
(snow 3-5, contrast 5), and that the L1 analyzer flags every such cell.
These tests pin the *composition* that claim rides on end-to-end on real
corrupted pixels: corrupted frame -> ops/signal analyzer status ->
explicit-failure-dominates trust collapse (reference signal_analyzer.py
brightness/entropy statuses + trust_engine.py decay lattice), regardless
of how confident the model layer is.

Formatting/aggregation logic of the measurement tool itself
(tools/defense_in_depth.py) is pinned here too; the measured numbers live
in measurements/r4/defense_in_depth.json.
"""

from __future__ import annotations

import numpy as np
import jax
import pytest

from fav_tpu.config import TrustParams
from fav_tpu.core.trust import TrustEngine
from fav_tpu.ops.corruptions import apply_corruption
from fav_tpu.ops.signal import SignalAnalyzer

from tools.defense_in_depth import markdown


def _textured_frame(h: int = 64, w: int = 64) -> np.ndarray:
    """Deterministic normal-exposure frame: gradients + texture so entropy,
    brightness and blur all sit inside the analyzer's OK band."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.45 + 0.12 * (x / w) + 0.06 * np.sin(y / 3.0) * np.cos(x / 5.0)
    rng = np.random.default_rng(7)
    img = np.clip(base[..., None] + rng.normal(0, 0.03, (h, w, 3)), 0, 1)
    return img.astype(np.float32)  # RGB [0,1]; clean entropy ~5.7 (OK band)


def _to_bgr_u8(img: np.ndarray) -> np.ndarray:
    return np.round(img[..., ::-1] * 255.0).astype(np.uint8)


def _run_trust(status: str, anomaly: float, ticks: int = 60, dt: float = 0.1):
    engine = TrustEngine(TrustParams())
    state = engine.get_state()
    for _ in range(ticks):
        # the serving composition (_tick_live): the wire anomaly is
        # max(analyzer, model); a confidently-blind model contributes 0.0,
        # so the analyzer's signal alone must carry the collapse
        state = engine.update(status, max(anomaly, 0.0), dt)
    return state


def test_snow_whiteout_collapses_trust_despite_confident_model():
    img = _textured_frame()
    snowy = apply_corruption("snow", jax.random.PRNGKey(3), img[None], 5)[0]
    # sev5 whiteout: the veil + clip destroys content (BENCH.md snow closure)
    assert float(np.mean(np.asarray(snowy))) > 0.9

    analyzer = SignalAnalyzer()
    res = analyzer.analyze_frame(_to_bgr_u8(np.asarray(snowy)))
    assert res["vision_status"] == "VISION_BLANK"
    assert res["anomaly_score"] > 0.3

    state = _run_trust(res["vision_status"], res["anomaly_score"])
    assert state["reliability"] < 0.3  # explicit failure dominates
    assert state["policy_state"] != "NORMAL_OPERATION"
    assert state["ml_influence_active"] is False  # model opinion locked out


def test_contrast_crush_flags_corrupted_and_collapses_trust():
    img = _textured_frame()
    crushed = apply_corruption("contrast", jax.random.PRNGKey(4), img[None], 5)[0]
    analyzer = SignalAnalyzer()
    res = analyzer.analyze_frame(_to_bgr_u8(np.asarray(crushed)))
    # contrast sev5 kills entropy while brightness stays mid-range ->
    # CORRUPTED, the draw-2 residual cell's exact signature
    assert res["vision_status"] in ("VISION_CORRUPTED", "VISION_BLANK")
    state = _run_trust(res["vision_status"], res["anomaly_score"])
    assert state["reliability"] < 0.5
    assert state["ml_influence_active"] is False


def test_clean_frame_is_ok_and_trust_recovers():
    analyzer = SignalAnalyzer()
    res = analyzer.analyze_frame(_to_bgr_u8(_textured_frame()))
    assert res["vision_status"] == "VISION_OK"  # zero-false-positive control
    state = _run_trust(res["vision_status"], res["anomaly_score"])
    assert state["reliability"] > 0.5
    assert state["ml_influence_active"] is True


def test_defense_tool_markdown_schema():
    rows = [{
        "draw": 0, "cell": "snow/5", "flag_rate": 1.0, "blank_rate": 1.0,
        "corrupted_rate": 0.0, "mean_anomaly": 0.724,
        "mean_brightness": 254.0, "mean_entropy": 0.41,
    }]
    md = markdown(rows)
    assert md.splitlines()[0].startswith("| draw | cell | L1 flag rate |")
    assert "| 0 | snow/5 | 1.000 | 1.000 | 0.000 | 0.724 | 254 | 0.41 |" in md
