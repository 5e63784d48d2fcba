"""Serving-stack tests: HTTP routes, upload whitelist, WebSocket streaming
and control dispatch, playground batch parity vs the host trust engine.

The WS client side uses the third-party ``websockets`` package, so our
stdlib RFC 6455 server implementation is validated against an independent
implementation (handshake, masking, fragmentation, close).
"""

import asyncio
import json
import os
import urllib.request

import pytest
import websockets

from fav_tpu.config import DEFAULT_CONFIG, FrameworkConfig, ServerParams
from fav_tpu.core.trust import TrustEngine
from fav_tpu.serving.app import create_app, run_playground_sequence
from fav_tpu.sim.anomaly_sim import AnomalySimulator


@pytest.fixture()
def app_server(tmp_path, unused_tcp_port_factory=None):
    """Run the app on an ephemeral port inside a dedicated event loop thread."""
    import socket
    import threading

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    frontend = tmp_path / "frontend"
    (frontend / "js").mkdir(parents=True)
    (frontend / "index.html").write_text("<html><body>fav_tpu dashboard</body></html>")
    (frontend / "js" / "app.js").write_text("// app")

    cfg = FrameworkConfig(server=ServerParams(host="127.0.0.1", port=port, upload_dir=str(tmp_path / "uploads")))

    loop = asyncio.new_event_loop()
    started = threading.Event()
    stop = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def serve():
            app = create_app(cfg, frontend_dir=str(frontend))
            server = await app.serve("127.0.0.1", port)
            started.set()
            while not stop.is_set():
                await asyncio.sleep(0.05)
            server.close()
            await server.wait_closed()
            # cancel lingering service workers (inference/analysis) so the
            # loop closes without pending-task warnings
            for task in asyncio.all_tasks():
                if task is not asyncio.current_task():
                    task.cancel()
            await asyncio.sleep(0)

        loop.run_until_complete(serve())

    thread = threading.Thread(target=run, daemon=True)
    thread.start()
    assert started.wait(timeout=10)
    yield f"127.0.0.1:{port}"
    stop.set()
    thread.join(timeout=5)
    loop.close()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.status, r.read()


def test_health(app_server):
    status, body = _get(f"http://{app_server}/health")
    assert status == 200
    assert json.loads(body) == {"status": "ok"}


def test_index_page(app_server):
    status, body = _get(f"http://{app_server}/")
    assert status == 200
    assert b"fav_tpu dashboard" in body


def test_static_mount_and_traversal_block(app_server):
    status, body = _get(f"http://{app_server}/js/app.js")
    assert status == 200 and b"// app" in body
    req = urllib.request.Request(f"http://{app_server}/js/../index.html")
    try:
        with urllib.request.urlopen(req, timeout=5) as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code in (403, 404)  # traversal must not escape the mount


def _multipart(filename: str, data: bytes) -> tuple[bytes, str]:
    boundary = "testboundary123"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="file"; filename="{filename}"\r\n'
        "Content-Type: application/octet-stream\r\n\r\n"
    ).encode() + data + f"\r\n--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def test_upload_video_whitelist(app_server):
    body, ctype = _multipart("clip.mp4", b"fakevideo")
    req = urllib.request.Request(
        f"http://{app_server}/api/upload-video", data=body, headers={"Content-Type": ctype}
    )
    with urllib.request.urlopen(req, timeout=5) as r:
        out = json.loads(r.read())
    assert out["filename"].endswith(".mp4")
    assert os.path.isfile(out["filepath"])

    body, ctype = _multipart("evil.exe", b"nope")
    req = urllib.request.Request(
        f"http://{app_server}/api/upload-video", data=body, headers={"Content-Type": ctype}
    )
    try:
        with urllib.request.urlopen(req, timeout=5) as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400  # whitelist (reference main.py:77-94)


async def _ws_session(uri, fn):
    async with websockets.connect(uri, open_timeout=5) as ws:
        return await fn(ws)


def test_ws_streams_state(app_server):
    async def fn(ws):
        msg = json.loads(await asyncio.wait_for(ws.recv(), 5))
        return msg

    state = asyncio.run(_ws_session(f"ws://{app_server}/ws", fn))
    for key in (
        "reliability", "policy_state", "vision_status", "anomaly_integral",
        "trust_velocity", "recovery_debt", "recovery_coeff",
        "contradiction_detected", "contradiction_count", "source_mode",
        "failure_events", "anomaly_score", "dt", "frame",
    ):
        assert key in state, key
    assert state["source_mode"] == "simulation"


def test_ws_control_frozen_decay(app_server):
    """set_vision frozen must drive reliability down (reference invariant 1:
    explicit failures dominate, platform/README.md:58-64)."""

    async def fn(ws):
        await ws.send(json.dumps({"action": "set_tick_rate", "rate": 60}))
        await ws.send(json.dumps({"action": "set_vision", "mode": "frozen"}))
        last = None
        for _ in range(40):
            last = json.loads(await asyncio.wait_for(ws.recv(), 5))
        return last

    state = asyncio.run(_ws_session(f"ws://{app_server}/ws", fn))
    assert state["vision_status"] == "VISION_FROZEN"
    assert state["reliability"] < 1.0


def test_ws_get_log_and_reset(app_server):
    async def fn(ws):
        for _ in range(3):
            await asyncio.wait_for(ws.recv(), 5)
        await ws.send(json.dumps({"action": "get_log"}))
        log = None
        for _ in range(20):
            msg = json.loads(await asyncio.wait_for(ws.recv(), 5))
            if msg.get("type") == "log_data":
                log = msg
                break
        await ws.send(json.dumps({"action": "reset"}))
        state = json.loads(await asyncio.wait_for(ws.recv(), 5))
        return log, state

    log, _ = asyncio.run(_ws_session(f"ws://{app_server}/ws", fn))
    assert log is not None
    assert log["csv"].startswith("timestamp,reliability,policy_state")
    assert log["entry_count"] >= 3
    assert "events_csv" in log


def test_ws_malformed_control_values_survive(app_server):
    """Non-numeric control values must produce an error reply, not tear the
    stream down (the reference blankets its control loop, main.py:210-304;
    round-1 ADVICE reproduced a ValueError killing the connection)."""

    async def fn(ws):
        await ws.send(json.dumps({"action": "set_tick_rate", "rate": "fast"}))
        await ws.send(json.dumps({"action": "set_noise", "level": "loud"}))
        await ws.send(json.dumps({"action": "set_brightness", "level": None}))
        errors, states = 0, 0
        for _ in range(20):
            msg = json.loads(await asyncio.wait_for(ws.recv(), 5))
            if msg.get("type") == "error":
                errors += 1
            elif "reliability" in msg:
                states += 1
        # stream still alive and controllable afterwards
        await ws.send(json.dumps({"action": "set_vision", "mode": "blank"}))
        for _ in range(10):
            msg = json.loads(await asyncio.wait_for(ws.recv(), 5))
            if msg.get("vision_status") == "VISION_BLANK":
                return errors, states, True
        return errors, states, False

    errors, states, controllable = asyncio.run(_ws_session(f"ws://{app_server}/ws", fn))
    assert errors >= 3, f"expected error replies, got {errors}"
    assert states > 0
    assert controllable


def test_ws_bad_source_mode_error(app_server):
    async def fn(ws):
        await ws.send(json.dumps({"action": "set_source_mode", "mode": "video", "filepath": "/nope.mp4"}))
        for _ in range(30):
            msg = json.loads(await asyncio.wait_for(ws.recv(), 5))
            if msg.get("type") == "error":
                return msg
        return None

    msg = asyncio.run(_ws_session(f"ws://{app_server}/ws", fn))
    assert msg is not None and "Could not open video" in msg["message"]


def test_playground_ws_roundtrip(app_server):
    events = [
        {"status": "VISION_OK", "noise": 0.0, "brightness": 0.5, "frames": 10},
        {"status": "VISION_FROZEN", "noise": 0.0, "brightness": 0.5, "frames": 20},
        {"status": "VISION_OK", "noise": 0.0, "brightness": 0.5, "frames": 30},
    ]

    async def fn(ws):
        await ws.send(json.dumps({"action": "simulate_sequence", "events": events}))
        return json.loads(await asyncio.wait_for(ws.recv(), 30))

    out = asyncio.run(_ws_session(f"ws://{app_server}/ws/playground", fn))
    assert out["type"] == "simulation_result"
    assert len(out["results"]) == 60
    assert out["results"][0]["sim_time"] == pytest.approx(1 / 30, abs=1e-4)


def test_playground_matches_host_engine():
    """The lax.scan playground replay must match a host TrustEngine driven by
    the same seed-99 anomaly stream at dt=1/30 (the reference's exact batch
    semantics, main.py:334-352) to 1e-9."""
    events = [
        {"status": "VISION_OK", "noise": 0.1, "brightness": 0.5, "frames": 40},
        {"status": "VISION_CORRUPTED", "noise": 0.6, "brightness": 0.3, "frames": 25},
        {"status": "VISION_OK", "noise": 0.0, "brightness": 0.5, "frames": 60},
    ]
    got = run_playground_sequence(events, DEFAULT_CONFIG)

    engine = TrustEngine(DEFAULT_CONFIG.trust)
    sim = AnomalySimulator(seed=99, params=DEFAULT_CONFIG.anomaly_sim)
    dt = 1.0 / 30.0
    expected = []
    for event in events:
        for _ in range(event["frames"]):
            score = sim.compute_anomaly(event["noise"], event["brightness"], event["status"])
            state = engine.update(event["status"], score, dt)
            expected.append((state["reliability"], state["policy_state"], state["anomaly_integral"]))

    assert len(got) == len(expected)
    for g, (rel, pol, integ) in zip(got, expected):
        assert g["reliability"] == pytest.approx(rel, abs=1e-9)
        assert g["policy_state"] == pol
        assert g["anomaly_integral"] == pytest.approx(integ, abs=1e-9)


def test_playground_empty_events():
    assert run_playground_sequence([]) == []


def test_ws_webcam_fallback(app_server):
    """No camera in this environment: set_source_mode webcam must emit the
    error and fall back to simulation (reference main.py:230-236)."""

    async def fn(ws):
        await ws.send(json.dumps({"action": "set_source_mode", "mode": "webcam"}))
        err = None
        for _ in range(40):
            msg = json.loads(await asyncio.wait_for(ws.recv(), 10))
            if msg.get("type") == "error":
                err = msg
                continue
            if err and msg.get("source_mode") == "simulation":
                return err, msg
        return err, None

    err, state = asyncio.run(_ws_session(f"ws://{app_server}/ws", fn))
    assert err is not None and "webcam" in err["message"].lower()
    assert state is not None  # stream continues in simulation mode


@pytest.fixture()
def ae_app_server(tmp_path):
    """App in uncertainty='autoencoder' mode with model anomaly feeding the
    trust engine, backed by the shipped AE checkpoint."""
    import os
    import socket
    import threading

    from fav_tpu.utils.checkpoint import DEFAULT_CKPT_DIR

    if not os.path.isdir(os.path.join(DEFAULT_CKPT_DIR, "autoencoder")):
        pytest.skip("no committed autoencoder checkpoint")

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    frontend = tmp_path / "frontend"
    frontend.mkdir()
    (frontend / "index.html").write_text("<html></html>")
    cfg = FrameworkConfig(
        server=ServerParams(
            host="127.0.0.1", port=port, upload_dir=str(tmp_path / "uploads"),
            uncertainty="autoencoder", use_model_anomaly=True,
        )
    )
    loop = asyncio.new_event_loop()
    started, stop = threading.Event(), threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def serve():
            app = create_app(cfg, frontend_dir=str(frontend))
            server = await app.serve("127.0.0.1", port)
            started.set()
            while not stop.is_set():
                await asyncio.sleep(0.05)
            server.close()
            await server.wait_closed()
            for task in asyncio.all_tasks():
                if task is not asyncio.current_task():
                    task.cancel()
            await asyncio.sleep(0)

        loop.run_until_complete(serve())

    thread = threading.Thread(target=run, daemon=True)
    thread.start()
    assert started.wait(timeout=10)
    yield f"127.0.0.1:{port}"
    stop.set()
    thread.join(timeout=5)
    loop.close()


@pytest.mark.slow
def test_ws_autoencoder_live_end_to_end(ae_app_server, tmp_path):
    """The reference's canonical ML design LIVE: reconstruction-error anomaly
    from the trained AE checkpoint drives serving (docs/system_notes.md:146-170).

    Stream a normal->black clip in AE mode and assert (a) the service scores
    frames from the TRAINED checkpoint (not random init), (b) rules dominate —
    BLANK status collapses reliability regardless of the AE (invariant 1,
    platform/README.md:58-64). NOTE the deviation from the reference's
    documented blind spot (their AE reconstructs dark frames easily,
    anomaly_simulator.py:65-70): OUR AE, trained on the synthetic set, flags
    black frames at ~7x its error baseline — measured, not assumed; the
    blind-spot parity home is the anomaly simulator (test_models.py)."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    path = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (320, 240))
    assert writer.isOpened()
    rng = np.random.default_rng(1)
    base = rng.integers(60, 200, (240, 320, 3)).astype(np.uint8)
    for phase, n in (("normal", 25), ("black", 25)):
        for i in range(n):
            frame = np.zeros((240, 320, 3), np.uint8) if phase == "black" else np.roll(base, i * 5, axis=1)
            writer.write(frame)
    writer.release()

    body, ctype = _multipart("clip.avi", open(path, "rb").read())
    req = urllib.request.Request(
        f"http://{ae_app_server}/api/upload-video", data=body, headers={"Content-Type": ctype}
    )
    with urllib.request.urlopen(req, timeout=5) as r:
        up = json.loads(r.read())

    async def fn(ws):
        await ws.send(json.dumps({"action": "set_source_mode", "mode": "video",
                                  "filepath": up["filepath"]}))
        saw_ml = saw_blank = False
        low_rel = 1.0
        # generous budget: the first-ever run compiles the AE (~40 s on CPU)
        # while warming heartbeats keep streaming and count against the loop
        for _ in range(2000):
            msg = json.loads(await asyncio.wait_for(ws.recv(), 20))
            if msg.get("type") == "error":
                raise AssertionError(msg)
            if msg.get("type"):
                continue
            ml = msg.get("ml_inference")
            if ml is not None:
                assert ml["prediction"] == -1  # AE mode has no classifier head
                saw_ml = True
            if msg.get("vision_status") == "VISION_BLANK":
                saw_blank = True
                low_rel = min(low_rel, msg["reliability"])
            if saw_ml and saw_blank and low_rel < 0.5:
                return True
        return (saw_ml, saw_blank, low_rel)

    assert asyncio.run(_ws_session(f"ws://{ae_app_server}/ws", fn)) is True

    # the scorer must be the trained checkpoint, loudly not random init
    with urllib.request.urlopen(f"http://{ae_app_server}/api/metrics", timeout=5) as r:
        info = json.loads(r.read())["inference"]
    assert info["uncertainty"] == "autoencoder"
    assert info["source"].startswith("checkpoint:"), info


@pytest.mark.slow
def test_ws_live_video_end_to_end(app_server, tmp_path):
    """Deepest integration: upload a real video over HTTP, switch the WS
    source to it, and watch analyzed live state (signal metrics, streamed
    JPEG frames, BLANK detection on the dark segment) come back."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    path = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (320, 240))
    assert writer.isOpened()
    rng = np.random.default_rng(0)
    base = rng.integers(60, 200, (240, 320, 3)).astype(np.uint8)
    for phase, n in (("normal", 20), ("black", 20), ("normal", 10)):
        for i in range(n):
            frame = np.zeros((240, 320, 3), np.uint8) if phase == "black" else np.roll(base, i * 5, axis=1)
            writer.write(frame)
    writer.release()

    body, ctype = _multipart("clip.avi", open(path, "rb").read())
    req = urllib.request.Request(
        f"http://{app_server}/api/upload-video", data=body, headers={"Content-Type": ctype}
    )
    with urllib.request.urlopen(req, timeout=5) as r:
        up = json.loads(r.read())

    async def fn(ws):
        await ws.send(json.dumps({"action": "set_source_mode", "mode": "video",
                                  "filepath": up["filepath"]}))
        saw_frame = saw_metrics = saw_blank = False
        for _ in range(400):
            msg = json.loads(await asyncio.wait_for(ws.recv(), 15))
            if msg.get("type") == "error":
                raise AssertionError(msg)
            if msg.get("type"):
                continue
            saw_frame = saw_frame or "video_frame" in msg
            saw_metrics = saw_metrics or "signal_metrics" in msg
            saw_blank = saw_blank or msg.get("vision_status") == "VISION_BLANK"
            if saw_frame and saw_metrics and saw_blank:
                return True
        return (saw_frame, saw_metrics, saw_blank)

    assert asyncio.run(_ws_session(f"ws://{app_server}/ws", fn)) is True


@pytest.mark.slow
def test_multi_worker_reuseport_serving(tmp_path):
    """FAV_SERVER_WORKERS=2 runs two serving processes sharing one port via
    SO_REUSEPORT (the scale-out mode for the per-core wire-stack ceiling,
    BENCH.md Serving): both workers must come up on the shared port, the
    surface must answer, a SIGKILLed worker must be respawned (capacity
    survives crashes), and SIGTERM must stop the whole tree gracefully."""
    import signal
    import socket
    import subprocess
    import sys
    import time

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",  # site hook off -> JAX_PLATFORMS works
        "JAX_PLATFORMS": "cpu",
        "FAV_SERVER_WORKERS": "2",
        "FAV_SERVER_HOST": "127.0.0.1",
        "FAV_SERVER_PORT": str(port),
        "FAV_SERVER_UPLOAD_DIR": str(tmp_path / "uploads"),
    })
    out_path = str(tmp_path / "workers.log")
    out_file = open(out_path, "w")
    proc = subprocess.Popen(
        [sys.executable, "-m", "fav_tpu.serving.app"],
        cwd=repo, env=env,
        stdout=out_file, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 120
        up = False
        while time.time() < deadline:
            try:
                status, _ = _get(f"http://127.0.0.1:{port}/health")
                up = status == 200
                break
            except OSError:
                time.sleep(0.5)
        assert up, "shared port never answered /health"
        for _ in range(6):  # several requests across kernel-balanced accepts
            status, body = _get(f"http://127.0.0.1:{port}/health")
            assert status == 200 and b"ok" in body
        # crash one worker: the supervisor must respawn it
        deadline = time.time() + 60
        first_pids = set()
        while time.time() < deadline and len(first_pids) < 2:
            first_pids = {int(line.split("(pid ")[1].split(")")[0])
                          for line in open(out_path).read().splitlines()
                          if "(pid " in line}
            time.sleep(0.3)
        assert len(first_pids) == 2, first_pids
        os.kill(sorted(first_pids)[0], signal.SIGKILL)
        deadline = time.time() + 90
        respawned = False
        while time.time() < deadline and not respawned:
            respawned = "respawning" in open(out_path).read()
            time.sleep(0.3)
        assert respawned, "supervisor never respawned the killed worker"
        deadline = time.time() + 90
        pids = set(first_pids)
        while time.time() < deadline and len(pids) < 3:
            pids = {int(line.split("(pid ")[1].split(")")[0])
                    for line in open(out_path).read().splitlines()
                    if "(pid " in line}
            time.sleep(0.3)
        assert len(pids) >= 3, f"no new worker pid appeared: {pids}"
        status, body = _get(f"http://127.0.0.1:{port}/health")
        assert status == 200 and b"ok" in body
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)
    out = open(out_path).read()
    assert "2 workers" in out
    assert "supervisor stopped" in out


def test_tick_live_degraded_wire_field(tmp_path):
    """While the predictor serves non-checkpoint weights, every live state
    carries model_degraded=True and the model anomaly is EXCLUDED from the
    trust engine's anomaly (analyzer-only) — the monitor's loud-failure rule
    applied to the predictor (VERDICT r3 missing #3; reference
    anomaly_simulator.py:7-9 fake-vs-real explicitness)."""
    import numpy as np

    from fav_tpu.serving.app import ConnectionState, _tick_live
    from fav_tpu.serving.inference import InferenceService
    from fav_tpu.config import ModelParams

    small = ModelParams(widths=(8, 16), dense_width=16)
    cfg = FrameworkConfig(model=small)
    conn = ConnectionState(cfg)
    conn.inference = InferenceService(small, checkpoint_dir=str(tmp_path / "none"))
    conn.source_mode = "video"

    class StubVideo:
        frame_id = 0

        def get_frame(self):
            self.frame_id += 1
            rng = np.random.default_rng(self.frame_id)
            return rng.integers(0, 256, (48, 64, 3)).astype(np.uint8), self.frame_id

        def stop(self):
            pass

    conn.video = StubVideo()

    async def run():
        # first ticks warm the model; keep ticking until scores attach.
        # Budget: a COLD flax init is ~15-17 s of sequential op-compiles on
        # this 1-core box (fine warm — earlier tests usually pre-compile),
        # so give it 60 s wall and exit as soon as scores attach.
        deadline = asyncio.get_running_loop().time() + 60.0
        while asyncio.get_running_loop().time() < deadline:
            state = await _tick_live(conn, 1 / 30)
            if conn.last_inference:
                break
            await asyncio.sleep(0.02)
        assert conn.last_inference, "model never warmed"
        assert conn.inference.degraded is True
        # inject a saturated model anomaly: with a degraded predictor it
        # must NOT reach the trust engine's anomaly score
        conn.last_inference = dict(conn.last_inference, model_anomaly=1.0)
        state = await _tick_live(conn, 1 / 30)
        # snapshot the analysis this tick consumed BEFORE the next await —
        # close() yields to the pipeline task, which may complete another
        # frame and overwrite conn.last_analysis (observed flaky under load)
        analysis = conn.last_analysis
        await conn.inference.close()
        return state, analysis

    state, analysis = asyncio.run(run())
    assert state["model_degraded"] is True
    assert "ml_inference" in state
    # analyzer-only anomaly: the injected 1.0 was excluded
    assert state["anomaly_score"] == round(analysis["anomaly_score"], 6)
    assert state["anomaly_score"] < 1.0


def test_tick_live_decoupled_from_slow_analysis(tmp_path):
    """The wire tick must NOT await the analysis path (VERDICT r3 #2): with
    an analyzer that takes 150 ms per frame, ticks still return in
    milliseconds, streaming the latest COMPLETED analysis tagged with its
    frame_id and a growing staleness_ms."""
    import time as _time

    import numpy as np

    from fav_tpu.config import ModelParams
    from fav_tpu.serving.app import ConnectionState, _tick_live

    cfg = FrameworkConfig(model=ModelParams(widths=(8, 16), dense_width=16))
    conn = ConnectionState(cfg)
    conn.inference = None  # isolate the analysis path
    conn.analysis = None  # force the per-connection analyzer fallback
    conn.source_mode = "video"

    class StubVideo:
        frame_id = 0

        def get_frame(self):
            self.frame_id += 1
            rng = np.random.default_rng(self.frame_id)
            return rng.integers(0, 256, (48, 64, 3)).astype(np.uint8), self.frame_id

        def stop(self):
            pass

    conn.video = StubVideo()

    real_analyze = conn.analyzer.analyze_frame

    def slow_analyze(frame):
        _time.sleep(0.15)
        return real_analyze(frame)

    conn.analyzer.analyze_frame = slow_analyze

    async def run():
        # first tick: starts the pipeline, returns a heartbeat immediately
        t0 = _time.monotonic()
        state = await _tick_live(conn, 1 / 30)
        first_ms = (_time.monotonic() - t0) * 1e3
        assert state.get("waiting_for_frame") or state.get("analysis_warming") \
            or "staleness_ms" in state
        assert first_ms < 100, f"tick blocked {first_ms:.0f} ms"

        # wait until the pipeline lands its first analysis
        for _ in range(100):
            if conn.last_analysis:
                break
            await asyncio.sleep(0.02)
        assert conn.last_analysis, "pipeline never produced an analysis"

        # 10 consecutive ticks while the analyzer is mid-frame: the wire
        # must hold rate (each tick far faster than the 150 ms analysis)
        t0 = _time.monotonic()
        states = [await _tick_live(conn, 1 / 30) for _ in range(10)]
        wall_ms = (_time.monotonic() - t0) * 1e3
        assert wall_ms < 500, f"10 ticks took {wall_ms:.0f} ms - tick still blocks"
        fid = conn.analysis_frame_id
        for s in states:
            assert s["frame_id"] == fid  # tagged with the ANALYZED frame
            assert "staleness_ms" in s and s["staleness_ms"] >= 0.0
        # staleness grows while no new analysis completes
        stales = [s["staleness_ms"] for s in states]
        assert stales[-1] > stales[0]
        conn.stop_pipeline()

    asyncio.run(run())


def test_tick_live_staleness_resets_on_fresh_analysis():
    """A completed analysis resets the staleness clock and advances the
    wire frame_id (stale-tag contract)."""
    import numpy as np

    from fav_tpu.config import ModelParams
    from fav_tpu.serving.app import ConnectionState, _tick_live

    cfg = FrameworkConfig(model=ModelParams(widths=(8, 16), dense_width=16))
    conn = ConnectionState(cfg)
    conn.inference = None
    conn.analysis = None
    conn.source_mode = "video"

    class StubVideo:
        frame_id = 0

        def get_frame(self):
            self.frame_id += 1
            rng = np.random.default_rng(self.frame_id)
            return rng.integers(0, 256, (48, 64, 3)).astype(np.uint8), self.frame_id

        def stop(self):
            pass

    conn.video = StubVideo()

    async def run():
        await _tick_live(conn, 1 / 30)
        for _ in range(200):
            if conn.last_analysis:
                break
            await asyncio.sleep(0.01)
        s1 = await _tick_live(conn, 1 / 30)
        fid1 = s1["frame_id"]
        # let the pipeline analyze at least one more frame
        for _ in range(200):
            if conn.analysis_frame_id > fid1:
                break
            await asyncio.sleep(0.01)
        s2 = await _tick_live(conn, 1 / 30)
        assert s2["frame_id"] > fid1  # fresh analysis advanced the tag
        assert s2["staleness_ms"] < 1000.0
        conn.stop_pipeline()

    asyncio.run(run())
