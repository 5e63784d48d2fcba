"""Signal-analyzer parity vs an OpenCV oracle + temporal behavior tests."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.config import AnalyzerParams, STATUS_NAMES
from fav_tpu.ops.signal import (
    SignalAnalyzer,
    analyze_clip,
    bgr_to_gray_cv2,
    histogram_entropy,
    init_analyzer_carry,
    laplacian_variance,
)

P = AnalyzerParams()
RNG = np.random.default_rng(42)


def make_frames():
    """A gallery of frames spanning the analyzer's regimes (320x240 BGR)."""
    h, w = 240, 320
    frames = {}
    frames["noise"] = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    frames["black"] = np.zeros((h, w, 3), np.uint8)
    frames["white"] = np.full((h, w, 3), 255, np.uint8)
    frames["gray_flat"] = np.full((h, w, 3), 128, np.uint8)
    # structured: gradient + shapes (normal-ish image)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        (80 + 60 * np.sin(xx / 17.0) + 50 * np.cos(yy / 23.0) + 30 * ((xx // 40 + yy // 40) % 2))
        .clip(0, 255)
        .astype(np.uint8)
    )
    img = (img // 4) * 4  # quantize so entropy lands in the healthy 4-7 band
    frames["structured"] = np.stack([img, img, img], axis=-1)
    # blurred version of structured
    frames["blurred"] = cv2.GaussianBlur(frames["structured"], (21, 21), 8)
    frames["dark"] = (frames["structured"] * 0.04).astype(np.uint8)
    return frames


FRAMES = make_frames()


class TestOraclesParity:
    @pytest.mark.parametrize("name", list(FRAMES))
    def test_grayscale_exact(self, name):
        frame = FRAMES[name]
        ours = np.asarray(bgr_to_gray_cv2(jnp.asarray(frame)))
        ref = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.int32)
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("name", list(FRAMES))
    def test_laplacian_variance(self, name):
        frame = FRAMES[name]
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        ref = cv2.Laplacian(gray, cv2.CV_64F).var()
        ours = float(laplacian_variance(jnp.asarray(gray.astype(np.int32)), dtype=jnp.float64))
        assert ours == pytest.approx(ref, rel=1e-9, abs=1e-9)

    @pytest.mark.parametrize("name", list(FRAMES))
    def test_histogram_entropy(self, name):
        frame = FRAMES[name]
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        hist = cv2.calcHist([gray], [0], None, [256], [0, 256]).flatten()
        p = hist / (hist.sum() + 1e-10)
        p = p[p > 0]
        ref = float(-np.sum(p * np.log2(p)))
        ours = float(histogram_entropy(jnp.asarray(gray.astype(np.int32)), dtype=jnp.float64))
        # cv2.calcHist returns float32 counts; our counts are float64 — 1e-7-level drift
        assert ours == pytest.approx(ref, rel=1e-6, abs=1e-6)

    @pytest.mark.parametrize(
        "name,expected_status",
        [
            ("black", "VISION_BLANK"),
            ("white", "VISION_BLANK"),
            ("noise", "VISION_CORRUPTED"),  # entropy ~8 > 7.5
            ("structured", "VISION_OK"),
            ("dark", "VISION_BLANK"),
        ],
    )
    def test_status_derivation(self, name, expected_status):
        analyzer = SignalAnalyzer(P)
        result = analyzer.analyze_frame(FRAMES[name])
        assert result["vision_status"] == expected_status

    def test_full_analyzer_against_reference_formulae(self):
        """End-to-end score parity on a structured frame (first frame: no freeze)."""
        frame = FRAMES["structured"]
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        lap_var = cv2.Laplacian(gray, cv2.CV_64F).var()
        blur = np.clip(1.0 - lap_var / 500.0, 0, 1)
        mean_b = float(np.mean(gray))
        bright = np.clip(abs(mean_b - 128.0) / 128.0, 0, 1)
        hist = cv2.calcHist([gray], [0], None, [256], [0, 256]).flatten()
        p = hist / (hist.sum() + 1e-10)
        p = p[p > 0]
        entropy = float(-np.sum(p * np.log2(p)))
        if entropy < 4.0:
            ent_score = np.clip((4.0 - entropy) / 4.0, 0, 1)
        elif entropy > 7.0:
            ent_score = np.clip((entropy - 7.0) / 1.5, 0, 1)
        else:
            ent_score = 0.0
        expected = np.clip(0.35 * blur + 0.25 * bright + 0.15 * 0.0 + 0.25 * ent_score, 0, 1)

        result = SignalAnalyzer(P).analyze_frame(frame)
        assert result["anomaly_score"] == pytest.approx(expected, abs=2e-5)
        assert result["metrics"]["raw"]["mean_brightness"] == pytest.approx(mean_b, abs=0.05)


class TestTemporalBehavior:
    def test_freeze_requires_consecutive_frames(self):
        analyzer = SignalAnalyzer(P)
        frame = FRAMES["structured"]
        statuses = [analyzer.analyze_frame(frame)["vision_status"] for _ in range(8)]
        # first frame OK (no prev), ticks 2-5 build the run, declared at the
        # 5th consecutive frozen diff (i.e. 6th identical frame)
        assert statuses[0] == "VISION_OK"
        assert "VISION_FROZEN" in statuses
        first_frozen = statuses.index("VISION_FROZEN")
        assert first_frozen == 5
        assert all(s == "VISION_FROZEN" for s in statuses[first_frozen:])

    def test_motion_resets_freeze_counter(self):
        analyzer = SignalAnalyzer(P)
        frame = FRAMES["structured"].copy()
        for _ in range(4):
            analyzer.analyze_frame(frame)
        moved = np.roll(frame, 13, axis=1)
        r = analyzer.analyze_frame(moved)
        assert r["vision_status"] == "VISION_OK"
        assert r["metrics"]["freeze"] == 0.0

    def test_clip_scan_matches_stepwise(self):
        frames = np.stack(
            [FRAMES["structured"]] * 6 + [FRAMES["noise"], FRAMES["black"]], axis=0
        )
        analyzer = SignalAnalyzer(P)
        step_scores = [analyzer.analyze_frame(f)["anomaly_score"] for f in frames]
        step_status = [STATUS_NAMES.index(s) for s in []]  # placeholder silence

        carry = init_analyzer_carry(240, 320)
        _, metrics = analyze_clip(P, jnp.asarray(frames), carry)
        np.testing.assert_allclose(
            np.asarray(metrics.anomaly_score), np.array(step_scores), atol=2e-5
        )

    def test_batched_streams_independent(self):
        """vmap semantics: two streams analyzed jointly == analyzed separately."""
        clip_a = np.stack([FRAMES["structured"]] * 5)
        clip_b = np.stack([FRAMES["noise"]] * 5)
        both = np.stack([clip_a, clip_b], axis=1)  # [T, B, H, W, 3]
        carry = init_analyzer_carry(240, 320, batch_shape=(2,))
        _, m = analyze_clip(P, jnp.asarray(both), carry)
        _, ma = analyze_clip(P, jnp.asarray(clip_a), init_analyzer_carry(240, 320))
        _, mb = analyze_clip(P, jnp.asarray(clip_b), init_analyzer_carry(240, 320))
        np.testing.assert_allclose(np.asarray(m.anomaly_score)[:, 0], np.asarray(ma.anomaly_score), atol=1e-6)
        np.testing.assert_allclose(np.asarray(m.anomaly_score)[:, 1], np.asarray(mb.anomaly_score), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(m.status)[:, 0], np.asarray(ma.status))
