"""Micro-batched, device-resident signal-analysis service.

The per-connection `SignalAnalyzer` facade issues one device call per frame;
on a TPU each dispatch costs ~10 ms, capping analyzed live streams at ~3 per
chip. This service batches frames from ALL connections into one call of the
batched analyzer (`analyze_frame_jax` is batch-first with per-stream
carries, fav_tpu/ops/signal.py), so N streams cost one dispatch.

Round 3 made the hot loop TPU-resident end to end (measured on hardware —
the original carry-per-caller design paid ~10 ms dispatch per carry slice
plus a blocking device-to-host fetch per metric field per row, ~256 round
trips per 32-stream batch over the tunneled backend):

* each live stream owns a SLOT in one device-resident batched
  :class:`AnalyzerCarry` (capacity+1 rows; the extra row is scratch for
  bucket padding). Carries never leave the device and never re-stack —
  the jitted step gathers the batch's slot rows, analyzes, and scatters
  back, with the carry buffer donated so XLA updates it in place.
* every metric field of the whole batch is packed on-device into ONE
  [B, 10] float32 array — a single device-to-host fetch per batch instead
  of fields x rows blocking scalar reads.
* frame uploads stay proportional to the *active* batch (shape buckets
  1/8/32, padded with the scratch slot), not to capacity.

Same fan-out pattern as :class:`fav_tpu.serving.inference.InferenceService`:
shared asyncio queue, shape buckets so nothing recompiles at runtime,
futures fan results back. Stream lifecycle: ``acquire_slot`` /
``release_slot``; a freshly (re)acquired slot is zeroed in-program via the
``reset`` mask on its first analyzed frame (no extra dispatch).
"""

from __future__ import annotations

import asyncio
import functools
import time
from typing import Optional

import numpy as np

from fav_tpu.config import AnalyzerParams, STATUS_NAMES

__all__ = ["AnalysisService"]

BUCKETS = (1, 8, 32)


def _analyze_slots_fn():
    """Build the jitted slot step lazily (keeps jax import off server boot)."""
    import jax
    import jax.numpy as jnp

    from fav_tpu.ops.signal import AnalyzerCarry, analyze_frame_jax

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def step(params, carry, frames, slots, reset):
        """One micro-batch: gather slot carries, analyze, scatter back.

        carry: AnalyzerCarry with [capacity+1, ...] rows (device-resident,
        donated). frames: uint8 [B, H, W, 3]. slots: int32 [B], unique per
        batch (pad rows use the scratch slot = capacity). reset: bool [B] —
        rows whose temporal state must restart (new/reused slot, source
        switch)."""
        sub = AnalyzerCarry(
            prev_gray=jnp.where(
                reset[:, None, None], 0, carry.prev_gray[slots]
            ),
            has_prev=jnp.where(reset, False, carry.has_prev[slots]),
            consecutive_frozen=jnp.where(reset, 0, carry.consecutive_frozen[slots]),
        )
        new_sub, m = analyze_frame_jax(params, sub, frames)
        out_carry = AnalyzerCarry(
            prev_gray=carry.prev_gray.at[slots].set(new_sub.prev_gray),
            has_prev=carry.has_prev.at[slots].set(new_sub.has_prev),
            consecutive_frozen=carry.consecutive_frozen.at[slots].set(
                new_sub.consecutive_frozen
            ),
        )
        f32 = jnp.float32
        packed = jnp.stack(
            [
                m.anomaly_score.astype(f32),
                m.status.astype(f32),
                m.blur_score.astype(f32),
                m.brightness_score.astype(f32),
                m.freeze_score.astype(f32),
                m.entropy_score.astype(f32),
                m.laplacian_var.astype(f32),
                m.mean_brightness.astype(f32),
                m.mean_diff.astype(f32),
                m.entropy.astype(f32),
            ],
            axis=-1,
        )
        return out_carry, packed

    return step


def _row_to_dict(row: np.ndarray) -> dict:
    """Packed metrics row -> the reference's analyze_frame dict
    (signal_analyzer.py:114-143 schema, same per-field rounding as the
    per-connection facade)."""
    return {
        "anomaly_score": round(float(row[0]), 6),
        "vision_status": STATUS_NAMES[int(row[1])],
        "metrics": {
            "blur": round(float(row[2]), 4),
            "brightness": round(float(row[3]), 4),
            "freeze": round(float(row[4]), 4),
            "entropy": round(float(row[5]), 4),
            "raw": {
                "laplacian_var": round(float(row[6]), 2),
                "mean_brightness": round(float(row[7]), 1),
                "frame_diff": round(float(row[8]), 2),
                "entropy": round(float(row[9]), 3),
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
        capacity: int = 64,
        timer=None,
    ):
        self.params = params or AnalyzerParams()
        self.height = height
        self.width = width
        self.max_wait = max_wait_ms / 1e3
        self.capacity = capacity
        self.timer = timer  # optional StageTimer: records analysis_device
        self._queue: asyncio.Queue = asyncio.Queue()
        self._worker: Optional[asyncio.Task] = None
        self._started = False
        self.ready = False  # True once all shape buckets are compiled
        self._free = list(range(capacity))
        self._pending_reset: set[int] = set()
        self._carry = None  # device-resident batched AnalyzerCarry
        self._step = None

    # ── stream lifecycle ──
    def acquire_slot(self) -> Optional[int]:
        """Claim a carry slot for a new stream; None when at capacity (the
        caller falls back to its per-connection analyzer)."""
        if not self._free:
            return None
        slot = self._free.pop()
        self._pending_reset.add(slot)
        return slot

    def release_slot(self, slot: int) -> None:
        if 0 <= slot < self.capacity and slot not in self._free:
            self._free.append(slot)

    def reset_slot(self, slot: int) -> None:
        """Restart a stream's temporal state (source switch, engine reset)
        without giving up the slot — applied in-program on its next frame."""
        self._pending_reset.add(slot)

    def _ensure_worker(self) -> None:
        if not self._started:
            self._started = True
            self._worker = asyncio.get_running_loop().create_task(self._run())

    async def analyze(self, frame_bgr: np.ndarray, slot: int) -> dict:
        """Submit one HxWx3 uint8 BGR frame for a claimed slot; returns the
        analysis dict."""
        self._ensure_worker()
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        await self._queue.put((frame_bgr, slot, fut))
        return await fut

    async def maybe_analyze(self, frame_bgr: np.ndarray, slot: int) -> Optional[dict]:
        """Non-blocking variant for the streaming tick: returns None while the
        analyzer is still compiling (minutes on a cold TPU) so the heartbeat
        keeps flowing; kicks warmup on first call."""
        self._ensure_worker()
        if not self.ready:
            return None
        return await self.analyze(frame_bgr, slot)

    async def close(self) -> None:
        if self._worker is not None:
            self._worker.cancel()
            try:
                await self._worker
            except asyncio.CancelledError:
                pass
            self._worker = None
            self._started = False

    # ── worker ──
    def _init_device_state(self) -> None:
        import jax.numpy as jnp

        from fav_tpu.ops.signal import init_analyzer_carry

        self._step = _analyze_slots_fn()
        # +1 scratch row: bucket padding scatters there harmlessly
        self._carry = init_analyzer_carry(
            self.height, self.width, batch_shape=(self.capacity + 1,)
        )
        # force materialization before the first donated call
        _ = jnp.asarray(self._carry.has_prev).block_until_ready()

    async def _run(self) -> None:
        # warm every shape bucket before declaring ready — otherwise the
        # first time a bigger bucket is hit, all live ticks stall behind its
        # compile (cold TPU compiles take minutes; the persistent cache makes
        # restarts instant)
        try:
            await asyncio.to_thread(self._init_device_state)
            warm = np.zeros((self.height, self.width, 3), np.uint8)
            for bucket in BUCKETS:
                # scratch slot for every row: warmup must not touch real slots
                await asyncio.to_thread(
                    self._analyze_batch,
                    [warm] * bucket,
                    [self.capacity] * bucket,
                    set(),
                )
            self.ready = True
        except Exception:
            import traceback

            traceback.print_exc()
            # leave ready=False: maybe_analyze keeps returning None and the
            # direct per-connection analyzer path still exists
        # PIPELINED dispatch/fetch: the device-to-host fetch of a batch's
        # packed metrics costs a full tunnel round trip (~30-45 ms measured)
        # while the device itself is busy ~1-2 ms. The worker therefore
        # DISPATCHES each batch (the carry dependency chain lives on-device,
        # so XLA serializes execution correctly) and hands the blocking fetch
        # to a thread, immediately collecting the next batch. Up to
        # _MAX_INFLIGHT fetches ride the tunnel concurrently.
        inflight = asyncio.Semaphore(self._MAX_INFLIGHT)
        pending: list = []
        inflight_slots: set[int] = set()
        fetch_tasks: set = set()  # strong refs: bare create_task can be GC'd

        async def fetch_and_resolve(packed, batch, t0):
            try:
                host = await asyncio.to_thread(np.asarray, packed)
                if self.timer is not None:
                    # dispatch-to-results latency for this batch (fetches
                    # overlap, so this is NOT the worker's serial cost)
                    self.timer.record("analysis_device", time.perf_counter() - t0)
                for i, (_, _, fut) in enumerate(batch):
                    if not fut.done():
                        fut.set_result(_row_to_dict(host[i]))
            except Exception as e:
                for _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(RuntimeError(f"analysis failed: {e}"))
            finally:
                inflight_slots.difference_update(s for _, s, _ in batch)
                inflight.release()

        while True:
            item = pending.pop(0) if pending else await self._queue.get()
            batch = [item]
            slots_in = {item[1]}
            deadline = asyncio.get_running_loop().time() + self.max_wait
            while len(batch) < BUCKETS[-1]:
                timeout = deadline - asyncio.get_running_loop().time()
                if timeout <= 0:
                    break
                try:
                    nxt = await asyncio.wait_for(self._queue.get(), timeout)
                except asyncio.TimeoutError:
                    break
                if nxt[1] in slots_in or nxt[1] in inflight_slots:
                    # same stream again: a full wave is already collected —
                    # flush now, keep the newcomer for the next batch (two
                    # in-flight frames of one stream would race on carry
                    # order and result attribution)
                    pending.append(nxt)
                    break
                batch.append(nxt)
                slots_in.add(nxt[1])
            await inflight.acquire()
            resets = {s for _, s, _ in batch if s in self._pending_reset}
            t0 = time.perf_counter()
            try:
                packed = await asyncio.to_thread(
                    self._dispatch_batch,
                    [b[0] for b in batch],
                    [b[1] for b in batch],
                    resets,
                )
                self._pending_reset -= resets
                inflight_slots.update(slots_in)
                task = asyncio.get_running_loop().create_task(
                    fetch_and_resolve(packed, batch, t0)
                )
                fetch_tasks.add(task)
                task.add_done_callback(fetch_tasks.discard)
            except Exception as e:
                inflight.release()
                for _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(RuntimeError(f"analysis failed: {e}"))
                # the donated carry may be in an undefined state — rebuild it
                # (streams lose temporal context; correctness recovers in two
                # frames) rather than serving garbage
                try:
                    await asyncio.to_thread(self._init_device_state)
                    for s in range(self.capacity):
                        self._pending_reset.add(s)
                except Exception:
                    self.ready = False

    _MAX_INFLIGHT = 4  # concurrent tunnel round trips (fetch side)

    def _dispatch_batch(self, frames: list, slots: list, resets: set):
        """Enqueue one batch on the device; returns the packed metrics
        device array WITHOUT fetching it (the caller pipelines the fetch)."""
        import jax.numpy as jnp

        n = len(frames)
        bucket = next(b for b in BUCKETS if b >= n)
        stack = np.zeros((bucket, self.height, self.width, 3), np.uint8)
        for i, f in enumerate(frames):
            stack[i] = f
        slot_arr = np.full((bucket,), self.capacity, np.int32)  # pads -> scratch
        slot_arr[:n] = slots
        reset_arr = np.zeros((bucket,), bool)
        reset_arr[n:] = True
        for i, s in enumerate(slots):
            reset_arr[i] = s in resets
        self._carry, packed = self._step(
            self.params, self._carry, jnp.asarray(stack), jnp.asarray(slot_arr),
            jnp.asarray(reset_arr)
        )
        return packed

    def _analyze_batch(self, frames: list, slots: list, resets: set) -> list:
        """Synchronous dispatch + fetch (warmup path)."""
        packed = self._dispatch_batch(frames, slots, resets)
        host = np.asarray(packed)  # ONE device-to-host fetch for the batch
        return [_row_to_dict(host[i]) for i in range(len(frames))]
