"""JPEG encoding for the browser stream.

Parity target: ``platform/backend/main.py:97-100`` — base64 JPEG at quality
40 attached to the WS state as ``video_frame``. Encoder priority:

1. the native C++ encoder (:mod:`fav_tpu.native`) when its shared library is
   built — keeps the hot 30 Hz path off the Python heap,
2. cv2's ``imencode`` (what the reference uses),
3. Pillow as a last resort.
"""

from __future__ import annotations

import base64
from typing import Optional

import numpy as np

from fav_tpu.config import VideoParams

try:
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

__all__ = ["encode_jpeg", "frame_to_base64_jpeg"]


def _native_encoder():
    try:
        from fav_tpu.native import jpeg_encode_bgr  # noqa: PLC0415

        return jpeg_encode_bgr
    except Exception:
        return None


def encode_jpeg(frame_bgr: np.ndarray, quality: int = 40) -> Optional[bytes]:
    native = _native_encoder()
    if native is not None:
        data = native(frame_bgr, quality)
        if data:
            return data
    if _HAS_CV2:
        ok, buf = cv2.imencode(".jpg", frame_bgr, [int(cv2.IMWRITE_JPEG_QUALITY), quality])
        return buf.tobytes() if ok else None
    try:  # pragma: no cover
        import io

        from PIL import Image

        img = Image.fromarray(frame_bgr[..., ::-1])  # BGR -> RGB
        out = io.BytesIO()
        img.save(out, format="JPEG", quality=quality)
        return out.getvalue()
    except Exception:
        return None


def frame_to_base64_jpeg(frame_bgr: np.ndarray, quality: int | None = None) -> Optional[str]:
    """Reference-exact wire format (main.py:97-100)."""
    q = VideoParams().jpeg_quality if quality is None else quality
    data = encode_jpeg(frame_bgr, q)
    return base64.b64encode(data).decode() if data else None
