"""Measure live-mode serving capacity end to end (VERDICT #3).

Drives N concurrent live-video websocket streams through the real serving
stack — upload over HTTP, `set_source_mode video`, then the full per-tick
path (VideoSource -> micro-batched AnalysisService -> micro-batched
InferenceService -> trust engine -> JPEG wire frame) — and reports the
sustained per-client rate plus the server's own per-stage p95s from
/api/metrics. Run the server on the target hardware first (TPU for the
BENCH.md numbers; the reference's hot loop this path supersedes is
platform/backend/main.py:151-188):

    FAV_SERVER_PORT=8777 python -m fav_tpu.serving.app   # on TPU
    python tools/serving_load_live.py --clients 8 --seconds 20

Prints ONE JSON line per run.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_clip(path: str, frames: int = 90) -> None:
    import cv2

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (320, 240))
    if not writer.isOpened():
        raise RuntimeError("VideoWriter failed to open")
    rng = np.random.default_rng(7)
    base = rng.integers(60, 200, (240, 320, 3)).astype(np.uint8)
    for i in range(frames):
        writer.write(np.roll(base, i * 3, axis=1))  # moving texture: no FROZEN
    writer.release()


def upload(server: str, path: str) -> str:
    boundary = "favLoadBoundary"
    with open(path, "rb") as f:
        data = f.read()
    body = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="clip.avi"\r\nContent-Type: video/avi\r\n\r\n'
    ).encode() + data + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"http://{server}/api/upload-video",
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())["filepath"]


def fetch_metrics(server: str) -> dict:
    with urllib.request.urlopen(f"http://{server}/api/metrics", timeout=10) as r:
        return json.loads(r.read())


async def run_client(server: str, filepath: str, warm_s: float, measure_s: float,
                     barrier: asyncio.Barrier) -> dict:
    import websockets

    analyzed = 0
    inferred = 0
    ticks = 0
    t_start = t_end = None
    async with websockets.connect(
        f"ws://{server}/ws", max_size=16 * 1024 * 1024, open_timeout=60
    ) as ws:
        await ws.recv()
        await ws.send(json.dumps({"action": "set_source_mode", "mode": "video",
                                  "filepath": filepath}))
        # warm phase: let compiles/services settle, all clients join before
        # the measurement window so load is truly concurrent
        deadline = time.monotonic() + warm_s
        while time.monotonic() < deadline:
            msg = json.loads(await asyncio.wait_for(ws.recv(), 120))
            if msg.get("type") == "error":
                raise AssertionError(msg)
        await barrier.wait()
        t_start = time.monotonic()
        deadline = t_start + measure_s
        while time.monotonic() < deadline:
            msg = json.loads(await asyncio.wait_for(ws.recv(), 120))
            if msg.get("type"):
                continue
            ticks += 1
            if "signal_metrics" in msg and not msg.get("analysis_warming"):
                analyzed += 1
            if "ml_inference" in msg:
                inferred += 1
        t_end = time.monotonic()
    dur = t_end - t_start
    return {"ticks_hz": ticks / dur, "analyzed_hz": analyzed / dur,
            "inferred": inferred, "dur": dur}


async def main_async(args) -> dict:
    clip = "/tmp/fav_load_clip.avi"
    make_clip(clip)
    filepath = upload(args.server, clip)
    barrier = asyncio.Barrier(args.clients)
    t0 = time.monotonic()
    results = await asyncio.gather(*[
        run_client(args.server, filepath, args.warm, args.seconds, barrier)
        for _ in range(args.clients)
    ])
    metrics = fetch_metrics(args.server)
    tick_hz = sorted(r["ticks_hz"] for r in results)
    an_hz = sorted(r["analyzed_hz"] for r in results)
    stages = {
        k: {"p50_ms": v["p50_ms"], "p95_ms": v["p95_ms"], "count": v["count"]}
        for k, v in metrics.get("stages", {}).items()
    }
    return {
        "clients": args.clients,
        "measure_s": args.seconds,
        "tick_hz_per_client_median": round(tick_hz[len(tick_hz) // 2], 2),
        "tick_hz_per_client_min": round(tick_hz[0], 2),
        "analyzed_hz_per_client_median": round(an_hz[len(an_hz) // 2], 2),
        "analyzed_hz_per_client_min": round(an_hz[0], 2),
        "aggregate_analyzed_hz": round(sum(an_hz), 1),
        "inference_attached": sum(r["inferred"] > 0 for r in results),
        "stages": stages,
        "model_source": metrics.get("inference", {}).get("source"),
        "wall_s": round(time.monotonic() - t0, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--server", default="127.0.0.1:8777")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--warm", type=float, default=15.0,
                   help="per-client settle time before the measured window")
    args = p.parse_args(argv)
    out = asyncio.run(main_async(args))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
