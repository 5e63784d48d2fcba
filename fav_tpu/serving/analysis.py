"""Micro-batched signal-analysis service.

The per-connection `SignalAnalyzer` facade issues one device call per frame;
on a TPU each dispatch costs ~10 ms, capping analyzed live streams at ~3 per
chip. This service batches frames from ALL connections into one call of the
batched analyzer (`analyze_frame_jax` is batch-first with per-stream
carries, fav_tpu/ops/signal.py), so N streams cost one dispatch.

Same pattern as :class:`fav_tpu.serving.inference.InferenceService`: shared
asyncio queue, shape buckets (1/8/32) so nothing recompiles at runtime,
futures fan results back. Each caller owns its :class:`AnalyzerCarry` and
threads it through — the service itself is stateless across calls.
"""

from __future__ import annotations

import asyncio
from typing import Optional

import numpy as np

from fav_tpu.config import AnalyzerParams, STATUS_NAMES

__all__ = ["AnalysisService", "metrics_to_dict"]

BUCKETS = (1, 8, 32)


def metrics_to_dict(m, i: int) -> dict:
    """Row i of batched FrameMetrics -> the reference's analyze_frame dict
    (signal_analyzer.py:114-143 schema)."""
    return {
        "anomaly_score": round(float(m.anomaly_score[i]), 6),
        "vision_status": STATUS_NAMES[int(m.status[i])],
        "metrics": {
            "blur": round(float(m.blur_score[i]), 4),
            "brightness": round(float(m.brightness_score[i]), 4),
            "freeze": round(float(m.freeze_score[i]), 4),
            "entropy": round(float(m.entropy_score[i]), 4),
            "raw": {
                "laplacian_var": round(float(m.laplacian_var[i]), 2),
                "mean_brightness": round(float(m.mean_brightness[i]), 1),
                "frame_diff": round(float(m.mean_diff[i]), 2),
                "entropy": round(float(m.entropy[i]), 3),
            },
        },
    }


class AnalysisService:
    """Shared micro-batched frame-quality analysis across connections."""

    def __init__(
        self,
        params: AnalyzerParams | None = None,
        height: int = 240,
        width: int = 320,
        max_wait_ms: float = 4.0,
    ):
        self.params = params or AnalyzerParams()
        self.height = height
        self.width = width
        self.max_wait = max_wait_ms / 1e3
        self._queue: asyncio.Queue = asyncio.Queue()
        self._worker: Optional[asyncio.Task] = None
        self._started = False
        self.ready = False  # True once all shape buckets are compiled

    def new_carry(self):
        """Fresh per-stream temporal state (prev frame + frozen counter)."""
        from fav_tpu.ops.signal import init_analyzer_carry

        return init_analyzer_carry(self.height, self.width)

    def _ensure_worker(self) -> None:
        if not self._started:
            self._started = True
            self._worker = asyncio.get_running_loop().create_task(self._run())

    async def analyze(self, frame_bgr: np.ndarray, carry) -> tuple:
        """Submit one HxWx3 uint8 BGR frame + its stream carry; returns
        (new_carry, analysis_dict)."""
        self._ensure_worker()
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        await self._queue.put((frame_bgr, carry, fut))
        return await fut

    async def maybe_analyze(self, frame_bgr: np.ndarray, carry) -> Optional[tuple]:
        """Non-blocking variant for the streaming tick: returns None while the
        analyzer is still compiling (minutes on a cold TPU) so the heartbeat
        keeps flowing; kicks warmup on first call."""
        self._ensure_worker()
        if not self.ready:
            return None
        return await self.analyze(frame_bgr, carry)

    async def close(self) -> None:
        if self._worker is not None:
            self._worker.cancel()
            try:
                await self._worker
            except asyncio.CancelledError:
                pass
            self._worker = None
            self._started = False

    async def _run(self) -> None:
        # warm every shape bucket before declaring ready — otherwise the
        # first time a bigger bucket is hit, all live ticks stall behind its
        # compile (cold TPU compiles take minutes; the persistent cache makes
        # restarts instant)
        try:
            warm_frame = np.zeros((self.height, self.width, 3), np.uint8)
            for bucket in BUCKETS:
                carries = [self.new_carry() for _ in range(bucket)]
                await asyncio.to_thread(
                    self._analyze_batch, [warm_frame] * bucket, carries
                )
            self.ready = True
        except Exception:
            import traceback

            traceback.print_exc()
            # leave ready=False: maybe_analyze keeps returning None and the
            # direct per-connection analyzer path still exists
        while True:
            item = await self._queue.get()
            batch = [item]
            deadline = asyncio.get_running_loop().time() + self.max_wait
            while len(batch) < BUCKETS[-1]:
                timeout = deadline - asyncio.get_running_loop().time()
                if timeout <= 0:
                    break
                try:
                    batch.append(await asyncio.wait_for(self._queue.get(), timeout))
                except asyncio.TimeoutError:
                    break
            try:
                results = await asyncio.to_thread(
                    self._analyze_batch, [b[0] for b in batch], [b[1] for b in batch]
                )
                for (_, _, fut), res in zip(batch, results):
                    if not fut.done():
                        fut.set_result(res)
            except Exception as e:
                for _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(RuntimeError(f"analysis failed: {e}"))

    def _analyze_batch(self, frames: list, carries: list) -> list:
        import jax
        import jax.numpy as jnp

        from fav_tpu.ops.signal import analyze_frame_jax

        n = len(frames)
        bucket = next(b for b in BUCKETS if b >= n) if n <= BUCKETS[-1] else BUCKETS[-1]
        pad = bucket - n
        stack = np.zeros((bucket, self.height, self.width, 3), np.uint8)
        for i, f in enumerate(frames[:bucket]):
            stack[i] = f
        full_carries = carries + [carries[-1]] * pad  # pad rows are discarded
        batched_carry = jax.tree.map(lambda *xs: jnp.stack(xs), *full_carries)
        new_carry, metrics = analyze_frame_jax(self.params, batched_carry, jnp.asarray(stack))
        out = []
        for i in range(n):
            one_carry = jax.tree.map(lambda x, i=i: x[i], new_carry)
            out.append((one_carry, metrics_to_dict(metrics, i)))
        return out
