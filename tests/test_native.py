"""Native C++ I/O layer tests (libjpeg codec + area resize via ctypes).

Oracle: OpenCV (what the reference used for these operations,
reference main.py:97-100, video_source.py:143-148).
"""

import numpy as np
import pytest

try:
    from fav_tpu.native import jpeg_decode_bgr, jpeg_encode_bgr, resize_area

    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

try:
    import cv2

    HAVE_CV2 = True
except Exception:
    HAVE_CV2 = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native toolchain/libjpeg unavailable")


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(0)
    # smooth-ish image (noise compresses pathologically and hides bugs)
    base = rng.integers(0, 256, (30, 40, 3)).astype(np.float32)
    big = np.kron(base, np.ones((8, 8, 1), np.float32))
    return np.clip(big, 0, 255).astype(np.uint8)


def test_roundtrip():
    # smooth gradient: roundtrip error is then dominated by quantization,
    # not 4:2:0 chroma subsampling of saturated random blocks
    yy, xx = np.mgrid[0:240, 0:320]
    smooth = np.stack([yy % 256, xx % 256, (yy + xx) // 2 % 256], -1).astype(np.uint8)
    data = jpeg_encode_bgr(smooth, 90)
    assert isinstance(data, bytes) and data[:2] == b"\xff\xd8"  # JPEG SOI
    back = jpeg_decode_bgr(data)
    assert back.shape == smooth.shape
    assert float(np.mean(np.abs(back.astype(int) - smooth.astype(int)))) < 4.0


def test_quality_monotonic(frame):
    small = jpeg_encode_bgr(frame, 10)
    big = jpeg_encode_bgr(frame, 95)
    assert len(small) < len(big)


@pytest.mark.skipif(not HAVE_CV2, reason="cv2 oracle unavailable")
def test_cv2_interop(frame):
    """cv2 must decode our stream to the exact same pixels as our decoder
    (both are libjpeg; the wire format is standard)."""
    data = jpeg_encode_bgr(frame, 40)
    ours = jpeg_decode_bgr(data)
    theirs = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(ours, theirs)
    # and we decode cv2's stream
    ok, ref = cv2.imencode(".jpg", frame, [int(cv2.IMWRITE_JPEG_QUALITY), 40])
    assert ok
    assert jpeg_decode_bgr(ref.tobytes()).shape == frame.shape


@pytest.mark.skipif(not HAVE_CV2, reason="cv2 oracle unavailable")
def test_resize_area_matches_cv2(frame):
    """Integer and fractional downscales must match cv2 INTER_AREA exactly
    (same box-average definition)."""
    for dw, dh in ((160, 120), (107, 83)):
        got = resize_area(frame, dw, dh)
        want = cv2.resize(frame, (dw, dh), interpolation=cv2.INTER_AREA)
        assert got.shape == want.shape
        # fractional boxes round at .5 like cv2; allow 1 LSB on boundaries
        assert int(np.max(np.abs(got.astype(int) - want.astype(int)))) <= 1


def test_encode_rejects_bad_shape():
    assert jpeg_encode_bgr(np.zeros((10, 10), np.uint8)) is None


def test_decode_rejects_garbage():
    assert jpeg_decode_bgr(b"not a jpeg at all") is None


def test_io_jpeg_uses_native(frame):
    """fav_tpu.io.jpeg must pick the native encoder when it's available."""
    from fav_tpu.io.jpeg import encode_jpeg

    data = encode_jpeg(frame, 40)
    assert data[:2] == b"\xff\xd8"
    assert jpeg_decode_bgr(data) is not None
