"""Measure LIVE-mode serving capacity end-to-end on real hardware (VERDICT #3).

Round 2 extrapolated "~870-1,070 analyzed 30 Hz streams/chip" from kernel
fps; the serving-load table measured only *simulation* mode on CPU. This
drives the exact path the reference's hot loop corresponds to
(/root/reference/platform/backend/main.py:151-188): N concurrent `/ws`
connections in video source mode -> VideoSource capture threads ->
micro-batched AnalysisService (+ InferenceService when a checkpoint is
loaded) -> trust engine -> JPEG-encoded state stream.

Protocol per client: connect, `set_source_mode` to a looping MJPG clip,
discard a warmup window, then count messages for --duration seconds and
record per-message fields (dt, frame_id deltas, analysis attached). Reports
aggregate + per-client Hz, the fraction of ticks carrying fresh analysis,
and the server's /api/metrics per-stage p95s.

Run the server separately (TPU backend for the real measurement):
  FAV_SERVER_PORT=8779 python -m fav_tpu.serving.app
then:
  python tools/bench_live_serving.py --port 8779 --clients 10 30
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLIP = "/tmp/fav_live_clip.avi"


def make_clip(path: str = CLIP, frames: int = 120) -> str:
    """Deterministic 320x240 MJPG clip with motion + texture (so blur/
    freeze/entropy metrics and the JPEG encoder all do real work)."""
    import cv2
    import numpy as np

    if os.path.isfile(path):
        return path
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (320, 240))
    rng = np.random.default_rng(7)
    for i in range(frames):
        f = np.zeros((240, 320, 3), np.uint8)
        f[:] = (30 + (i * 2) % 60, 60, 90)
        cv2.circle(f, (40 + (i * 5) % 280, 100 + (i * 3) % 80), 30, (0, 200, 255), -1)
        cv2.rectangle(f, (10, 10), (310, 230), (120, 120, 120), 2)
        f = np.clip(f.astype(np.int16) + rng.integers(0, 25, f.shape), 0, 255).astype(np.uint8)
        w.write(f)
    w.release()
    return path


async def drive_client(
    uri: str, clip: str, warmup_s: float, duration_s: float, results: list
) -> None:
    import websockets

    async with websockets.connect(uri, max_size=2**22) as ws:
        await ws.recv()  # first state
        await ws.send(json.dumps(
            {"action": "set_source_mode", "mode": "video", "filepath": clip}
        ))
        t_end_warm = time.monotonic() + warmup_s
        while time.monotonic() < t_end_warm:
            await asyncio.wait_for(ws.recv(), timeout=30)
        n_msgs = 0
        n_analysis = 0
        n_frames = 0
        last_fid = None
        dts = []
        stales = []
        t0 = time.monotonic()
        while time.monotonic() - t0 < duration_s:
            msg = json.loads(await asyncio.wait_for(ws.recv(), timeout=30))
            n_msgs += 1
            if "signal_metrics" in msg:
                n_analysis += 1
            fid = msg.get("frame_id")
            if fid is not None and fid != last_fid:
                n_frames += 1
                last_fid = fid
            if "dt" in msg:
                dts.append(msg["dt"])
            if "staleness_ms" in msg:
                stales.append(msg["staleness_ms"])
        elapsed = time.monotonic() - t0
        results.append({
            "hz": n_msgs / elapsed,
            "analysis_frac": n_analysis / max(n_msgs, 1),
            "fresh_frames_hz": n_frames / elapsed,
            "dt_p95": sorted(dts)[int(len(dts) * 0.95)] if dts else None,
            "staleness_p50": (
                sorted(stales)[len(stales) // 2] if stales else None
            ),
            "staleness_p95": (
                sorted(stales)[int(len(stales) * 0.95)] if stales else None
            ),
        })


async def run_level(host: str, port: int, n_clients: int, warmup_s: float,
                    duration_s: float, clip: str) -> dict:
    uri = f"ws://{host}:{port}/ws"
    results: list = []
    tasks = [
        asyncio.create_task(drive_client(uri, clip, warmup_s, duration_s, results))
        for _ in range(n_clients)
    ]
    errs = 0
    for t in tasks:
        try:
            await t
        except Exception as e:
            errs += 1
            print(f"  client error: {type(e).__name__}: {e}", file=sys.stderr)
    hz = [r["hz"] for r in results]
    summary = {
        "clients": n_clients,
        "completed": len(results),
        "errors": errs,
        "aggregate_msgs_per_s": round(sum(hz), 1),
        "per_client_hz_mean": round(statistics.mean(hz), 2) if hz else None,
        "per_client_hz_min": round(min(hz), 2) if hz else None,
        "analysis_frac_mean": round(
            statistics.mean(r["analysis_frac"] for r in results), 3
        ) if results else None,
        "fresh_frames_hz_mean": round(
            statistics.mean(r["fresh_frames_hz"] for r in results), 2
        ) if results else None,
        "dt_p95_max": max((r["dt_p95"] for r in results if r["dt_p95"]), default=None),
        "staleness_p50_mean": round(
            statistics.mean(r["staleness_p50"] for r in results
                            if r["staleness_p50"] is not None), 1
        ) if any(r["staleness_p50"] is not None for r in results) else None,
        "staleness_p95_max": max(
            (r["staleness_p95"] for r in results if r["staleness_p95"] is not None),
            default=None),
    }
    with urllib.request.urlopen(f"http://{host}:{port}/api/metrics", timeout=10) as r:
        summary["server_metrics"] = json.loads(r.read())
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8779)
    ap.add_argument("--clients", type=int, nargs="+", default=[1, 5, 10, 20, 30])
    ap.add_argument("--warmup", type=float, default=8.0)
    ap.add_argument("--duration", type=float, default=15.0)
    args = ap.parse_args()

    clip = make_clip()
    for n in args.clients:
        summary = asyncio.run(
            run_level(args.host, args.port, n, args.warmup, args.duration, clip)
        )
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
