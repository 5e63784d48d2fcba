"""Micro-batched analysis service must be observationally identical to the
per-connection SignalAnalyzer facade — same scores, same statuses, same
temporal (freeze) behavior — while serving concurrent streams in one call."""

import asyncio

import numpy as np
import pytest

from fav_tpu.config import AnalyzerParams
from fav_tpu.ops.signal import SignalAnalyzer
from fav_tpu.serving.analysis import AnalysisService

H, W = 48, 64


def _frame(seed):
    return np.random.default_rng(seed).integers(0, 256, (H, W, 3)).astype(np.uint8)


def test_service_matches_direct_analyzer():
    service = AnalysisService(AnalyzerParams(), height=H, width=W)
    direct = SignalAnalyzer(AnalyzerParams(), height=H, width=W)
    frames = [_frame(i) for i in range(5)]

    async def run():
        carry = service.new_carry()
        out = []
        for f in frames:
            carry, res = await service.analyze(f, carry)
            out.append(res)
        await service.close()
        return out

    got = asyncio.run(run())
    want = [direct.analyze_frame(f) for f in frames]
    for g, w in zip(got, want):
        assert g["vision_status"] == w["vision_status"]
        assert g["anomaly_score"] == pytest.approx(w["anomaly_score"], abs=1e-6)
        assert g["metrics"]["raw"] == w["metrics"]["raw"]


def test_service_freeze_state_per_stream():
    """Two interleaved streams: one frozen (same frame), one live — carries
    must not bleed across streams in the shared batch."""
    service = AnalysisService(AnalyzerParams(), height=H, width=W)
    frozen_frame = _frame(0)

    async def run():
        c1 = service.new_carry()
        c2 = service.new_carry()
        last1 = last2 = None
        for i in range(7):
            (c1, last1), (c2, last2) = await asyncio.gather(
                service.analyze(frozen_frame, c1),      # stream 1: frozen
                service.analyze(_frame(100 + i), c2),   # stream 2: changing
            )
        await service.close()
        return last1, last2

    frozen_res, live_res = asyncio.run(run())
    assert frozen_res["vision_status"] == "VISION_FROZEN"
    assert live_res["vision_status"] != "VISION_FROZEN"


def test_service_concurrent_batch():
    """8 concurrent streams resolve in one shot with correct independent
    results (padding rows must not leak)."""
    service = AnalysisService(AnalyzerParams(), height=H, width=W)
    direct = SignalAnalyzer(AnalyzerParams(), height=H, width=W)

    async def run():
        carries = [service.new_carry() for _ in range(8)]
        frames = [_frame(i) for i in range(8)]
        results = await asyncio.gather(
            *[service.analyze(f, c) for f, c in zip(frames, carries)]
        )
        await service.close()
        return frames, [r[1] for r in results]

    frames, got = asyncio.run(run())
    for f, g in zip(frames, got):
        direct.reset()
        w = direct.analyze_frame(f)
        assert g["metrics"]["raw"]["entropy"] == pytest.approx(
            w["metrics"]["raw"]["entropy"], abs=1e-3
        )
        assert g["vision_status"] == w["vision_status"]
