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


def test_cell_key_is_the_fused_sweep_schedule():
    """`sweep.cell_key` (the exported schedule the defense-in-depth tool and
    the policy replay consume) must be bitwise the fused/per-cell paths'
    `fold_in(key, absolute_cell_index)` enumeration over the full grid —
    the "grid's EXACT batches" claim, pinned instead of hand-copied
    (VERDICT r4 weak #3)."""
    from fav_tpu.ops.corruptions import CORRUPTION_NAMES, SEVERITIES
    from fav_tpu.parallel.sweep import cell_key

    key = jax.random.PRNGKey(42)
    cells = [(n, s) for n in CORRUPTION_NAMES for s in SEVERITIES]
    for i, (n, s) in enumerate(cells):
        expect = np.asarray(jax.random.fold_in(key, i))
        got = np.asarray(cell_key(key, n, s))
        assert (got == expect).all(), (n, s)


def test_tool_batch_bitwise_equals_sweep_batch():
    """The corrupted pixels the defense-in-depth tool analyzes must be
    bitwise the pixels the grid scored: same key schedule (cell_key), same
    corruption op (apply_corruption == corruption_fn(name))."""
    import jax.numpy as jnp
    from fav_tpu.ops.corruptions import CORRUPTION_NAMES, SEVERITIES, corruption_fn
    from fav_tpu.parallel.sweep import cell_key

    key = jax.random.PRNGKey(42)
    images = jnp.asarray(np.stack([_textured_frame(32, 32)] * 4))
    # the op is the same table entry on both sides...
    assert corruption_fn("snow") is apply_corruption.__wrapped__.__globals__["CORRUPTIONS"]["snow"]
    # ...so the rot hazard is the key derivation: the tool's cell_key must
    # produce bitwise the batch the sweep's fold_in(key, absolute_index) does
    # through the SAME jitted dispatcher
    i = CORRUPTION_NAMES.index("snow") * len(SEVERITIES) + (5 - 1)
    sweep_batch = apply_corruption("snow", jax.random.fold_in(key, i), images, 5)
    tool_batch = apply_corruption("snow", cell_key(key, "snow", 5), images, 5)
    assert (np.asarray(sweep_batch) == np.asarray(tool_batch)).all()


def test_sweep_l1_columns_flag_whiteout_under_confident_model():
    """The in-sweep L1 pass IS the defense-in-depth measurement: on a snow
    sev-5 whiteout cell, a model that stays confidently wrong (anomaly ~0)
    must still yield l1_flag_rate ~1 (BLANK) and a high composed anomaly —
    the grid itself now reports the unflagged-confident-wrong account the
    side tool used to compute (VERDICT r4 missing #3)."""
    import jax.numpy as jnp
    from fav_tpu.parallel.sweep import sweep_cell

    images = jnp.asarray(np.stack([_textured_frame(32, 32)] * 8))
    labels = jnp.zeros((8,), jnp.int32)

    def confident_wrong(params, x):
        # class 3 at ~99.9% confidence regardless of input
        logits = jnp.zeros((x.shape[0], 10), jnp.float32)
        return logits.at[:, 3].set(12.0)

    cell = sweep_cell(
        "snow", confident_wrong, None, images, labels,
        jax.random.PRNGKey(0), 5,
    )
    assert float(cell["accuracy"]) == 0.0
    assert float(cell["mean_confidence"]) > 0.95
    assert float(cell["mean_anomaly"]) < 0.1  # model layer is blind
    assert float(cell["l1_flag_rate"]) == 1.0
    assert float(cell["l1_blank_rate"]) == 1.0  # whiteout -> BLANK
    assert float(cell["mean_anomaly_composed"]) > 0.3  # analyzer carries it
    # and on a clean-ish cell the analyzer stays quiet (no false positives)
    ok = sweep_cell(
        "brightness", confident_wrong, None, images, labels,
        jax.random.PRNGKey(0), 1,
    )
    assert float(ok["l1_flag_rate"]) == 0.0


def test_defense_tool_markdown_schema():
    rows = [{
        "draw": 0, "cell": "snow/5", "flag_rate": 1.0, "blank_rate": 1.0,
        "corrupted_rate": 0.0, "mean_anomaly": 0.724,
        "mean_brightness": 254.0, "mean_entropy": 0.41,
    }]
    md = markdown(rows)
    assert md.splitlines()[0].startswith("| draw | cell | L1 flag rate |")
    assert "| 0 | snow/5 | 1.000 | 1.000 | 0.000 | 0.724 | 254 | 0.41 |" in md
