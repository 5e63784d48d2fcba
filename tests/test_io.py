"""Threaded video capture tests (fav_tpu/io/video.py) against a generated
video file — covers the reference semantics: monotonic frame ids, 320x240
normalization, EOF looping, thread-safe latest-frame handoff, clean stop
(reference video_source.py)."""

import os
import time

import numpy as np
import pytest

try:
    import cv2

    HAVE_CV2 = True
except Exception:
    HAVE_CV2 = False

from fav_tpu.config import VideoParams
from fav_tpu.io.video import VideoSource

pytestmark = pytest.mark.skipif(not HAVE_CV2, reason="cv2 unavailable")


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    """12-frame 160x120 video, frame index encoded in the blue channel."""
    path = str(tmp_path_factory.mktemp("vid") / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (160, 120))
    assert writer.isOpened()
    for i in range(12):
        frame = np.full((120, 160, 3), 0, np.uint8)
        frame[..., 0] = i * 20
        writer.write(frame)
    writer.release()
    return path


def test_start_stop_and_frames(video_file):
    src = VideoSource(VideoParams())
    assert src.start(video_file)
    deadline = time.time() + 5
    frame, fid = None, 0
    while time.time() < deadline:
        frame, fid = src.get_frame()
        if fid >= 2:
            break
        time.sleep(0.02)
    src.stop()
    assert fid >= 2
    assert frame.shape == (240, 320, 3)  # normalized (video_source.py:29-30)
    assert not src.running


def test_frame_ids_monotonic(video_file):
    src = VideoSource(VideoParams())
    assert src.start(video_file)
    ids = []
    deadline = time.time() + 5
    while len(ids) < 8 and time.time() < deadline:
        _, fid = src.get_frame()
        if fid and (not ids or fid > ids[-1]):
            ids.append(fid)
        time.sleep(0.01)
    src.stop()
    assert ids == sorted(ids) and len(ids) >= 3


def test_file_loops_at_eof(video_file):
    """A 12-frame file must keep producing frames well past 12 reads
    (loop-to-start, video_source.py:134-138)."""
    src = VideoSource(VideoParams())
    assert src.start(video_file)
    deadline = time.time() + 10
    fid = 0
    while time.time() < deadline:
        _, fid = src.get_frame()
        if fid > 15:
            break
        time.sleep(0.02)
    src.stop()
    assert fid > 15


def test_bad_source_returns_false(tmp_path):
    src = VideoSource(VideoParams())
    assert src.start(str(tmp_path / "missing.mp4")) is False
    assert not src.running
    src.stop()  # idempotent


def test_restart_resets_frame_ids(video_file):
    src = VideoSource(VideoParams())
    assert src.start(video_file)
    time.sleep(0.3)
    _, fid1 = src.get_frame()
    assert src.start(video_file)  # restart
    _, fid2 = src.get_frame()
    src.stop()
    assert fid2 <= max(1, fid1)  # counter restarted


def test_demand_driven_decode_skips_unconsumed_frames(video_file):
    """File sources decode only on consumer demand: while nobody calls
    get_frame the clip advances via grab() (real-time playback, frames
    dropped) but frame_id must NOT advance — with N slow-ticking live
    streams, decode cost scales with the analyzed rate, not N x clip FPS
    (measured on the 1-core serving host, BENCH.md Serving)."""
    src = VideoSource(VideoParams())
    assert src.start(video_file)
    deadline = time.time() + 5
    fid = 0
    while fid < 1 and time.time() < deadline:
        frame, fid = src.get_frame()
        time.sleep(0.01)
    assert fid >= 1
    time.sleep(0.3)  # 9+ clip frames pass, unconsumed
    _, fid_idle = src.get_frame()
    assert fid_idle <= fid + 1  # at most one decode-ahead, not ~9
    # demand resumes decoding: polling must advance the id again
    deadline = time.time() + 5
    fid2 = fid_idle
    while fid2 < fid_idle + 3 and time.time() < deadline:
        _, fid2 = src.get_frame()
        time.sleep(0.01)
    src.stop()
    assert fid2 >= fid_idle + 3
