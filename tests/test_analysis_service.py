"""Micro-batched analysis service must be observationally identical to the
per-connection SignalAnalyzer facade — same scores, same statuses, same
temporal (freeze) behavior — while serving concurrent streams in one call
against the device-resident slot carry."""

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
        slot = service.acquire_slot()
        out = []
        for f in frames:
            out.append(await service.analyze(f, slot))
        service.release_slot(slot)
        await service.close()
        return out

    got = asyncio.run(run())
    want = [direct.analyze_frame(f) for f in frames]
    for g, w in zip(got, want):
        assert g["vision_status"] == w["vision_status"]
        assert g["anomaly_score"] == pytest.approx(w["anomaly_score"], abs=1e-6)
        assert g["metrics"]["raw"] == w["metrics"]["raw"]


def test_service_freeze_state_per_stream():
    """Two interleaved streams: one frozen (same frame), one live — slot
    carries must not bleed across streams in the shared batch."""
    service = AnalysisService(AnalyzerParams(), height=H, width=W)
    frozen_frame = _frame(0)

    async def run():
        s1 = service.acquire_slot()
        s2 = service.acquire_slot()
        last1 = last2 = None
        for i in range(7):
            last1, last2 = await asyncio.gather(
                service.analyze(frozen_frame, s1),      # stream 1: frozen
                service.analyze(_frame(100 + i), s2),   # stream 2: changing
            )
        await service.close()
        return last1, last2

    frozen_res, live_res = asyncio.run(run())
    assert frozen_res["vision_status"] == "VISION_FROZEN"
    assert live_res["vision_status"] != "VISION_FROZEN"


def test_service_concurrent_batch():
    """8 concurrent streams resolve in one shot with correct independent
    results (scratch-slot padding rows must not leak)."""
    service = AnalysisService(AnalyzerParams(), height=H, width=W)
    direct = SignalAnalyzer(AnalyzerParams(), height=H, width=W)

    async def run():
        slots = [service.acquire_slot() for _ in range(8)]
        frames = [_frame(i) for i in range(8)]
        results = await asyncio.gather(
            *[service.analyze(f, s) for f, s in zip(frames, slots)]
        )
        await service.close()
        return frames, results

    frames, got = asyncio.run(run())
    for f, g in zip(frames, got):
        direct.reset()
        w = direct.analyze_frame(f)
        assert g["metrics"]["raw"]["entropy"] == pytest.approx(
            w["metrics"]["raw"]["entropy"], abs=1e-3
        )
        assert g["vision_status"] == w["vision_status"]


def test_slot_reuse_resets_temporal_state():
    """release + acquire hands the slot to a NEW stream: the old stream's
    prev-frame must not leak (a same-frame submit right after reuse must
    not count as frozen continuation)."""
    service = AnalysisService(AnalyzerParams(), height=H, width=W)
    f = _frame(3)

    async def run():
        slot = service.acquire_slot()
        for _ in range(6):
            res_old = await service.analyze(f, slot)
        service.release_slot(slot)
        slot2 = service.acquire_slot()
        res_new = await service.analyze(f, slot2)
        await service.close()
        return res_old, res_new, slot, slot2

    res_old, res_new, slot, slot2 = asyncio.run(run())
    assert slot2 == slot  # free-list reuse: the test exercises real reuse
    assert res_old["vision_status"] == "VISION_FROZEN"
    # fresh stream: no prev frame -> frame_diff forced to 10.0, not frozen
    assert res_new["vision_status"] != "VISION_FROZEN"
    assert res_new["metrics"]["raw"]["frame_diff"] == pytest.approx(10.0)


def test_reset_slot_restarts_freeze_tracking():
    """reset_slot (source switch) restarts the freeze counter in-program."""
    service = AnalysisService(AnalyzerParams(), height=H, width=W)
    f = _frame(4)

    async def run():
        slot = service.acquire_slot()
        for _ in range(6):
            frozen = await service.analyze(f, slot)
        service.reset_slot(slot)
        after = await service.analyze(f, slot)
        await service.close()
        return frozen, after

    frozen, after = asyncio.run(run())
    assert frozen["vision_status"] == "VISION_FROZEN"
    assert after["vision_status"] != "VISION_FROZEN"


def test_capacity_exhaustion_returns_none():
    service = AnalysisService(AnalyzerParams(), height=H, width=W, capacity=2)
    a, b = service.acquire_slot(), service.acquire_slot()
    assert {a, b} == {0, 1}
    assert service.acquire_slot() is None
    service.release_slot(b)
    assert service.acquire_slot() == b
