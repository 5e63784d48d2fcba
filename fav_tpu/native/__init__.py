"""Native host layer: C++ JPEG codec + area resize via ctypes.

SURVEY.md §2.4: the reference's only native execution hides inside OpenCV
wheels (imencode at main.py:97-100, resize at video_source.py:144-148); the
TPU build makes the host-side hot path first-class C++ — libjpeg encode
(direct JCS_EXT_BGR, no swizzle) for the 30 Hz browser stream, decode for the
upload path, and an INTER_AREA box resize for capture normalization.

The shared library builds on first import (g++ -O3, ~1 s) and is cached next
to the source. Everything degrades gracefully: if the toolchain or libjpeg is
absent, importing raises and callers (fav_tpu.io.jpeg) fall back to cv2/PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["jpeg_encode_bgr", "jpeg_decode_bgr", "resize_area", "lib_path"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "jpegio.cpp")
_LIB = os.path.join(_DIR, "libfavnative.so")


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        _SRC, "-ljpeg", "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load() -> ctypes.CDLL:
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.fav_jpeg_encode_bgr.restype = ctypes.c_int
    lib.fav_jpeg_encode_bgr.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_ulong),
    ]
    lib.fav_jpeg_decode_bgr.restype = ctypes.c_int
    lib.fav_jpeg_decode_bgr.argtypes = [
        ctypes.c_void_p, ctypes.c_ulong, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.fav_resize_area_u8.restype = ctypes.c_int
    lib.fav_resize_area_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.fav_free.restype = None
    lib.fav_free.argtypes = [ctypes.c_void_p]
    return lib


_lib = _load()


def jpeg_encode_bgr(frame: np.ndarray, quality: int = 40) -> bytes | None:
    """BGR uint8 HxWx3 -> JPEG bytes (reference wire format, main.py:97-100)."""
    frame = np.ascontiguousarray(frame, dtype=np.uint8)
    if frame.ndim != 3 or frame.shape[2] != 3:
        return None
    h, w = frame.shape[:2]
    out = ctypes.c_void_p()
    size = ctypes.c_ulong()
    rc = _lib.fav_jpeg_encode_bgr(
        frame.ctypes.data_as(ctypes.c_void_p), w, h, w * 3, int(quality),
        ctypes.byref(out), ctypes.byref(size),
    )
    if rc != 0 or not out:
        return None
    try:
        return ctypes.string_at(out, size.value)
    finally:
        _lib.fav_free(out)


def jpeg_decode_bgr(data: bytes) -> np.ndarray | None:
    """JPEG bytes -> BGR uint8 HxWx3 array."""
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = _lib.fav_jpeg_decode_bgr(
        buf.ctypes.data_as(ctypes.c_void_p), len(data), None,
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0 or w.value <= 0 or h.value <= 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = _lib.fav_jpeg_decode_bgr(
        buf.ctypes.data_as(ctypes.c_void_p), len(data),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.byref(w), ctypes.byref(h),
    )
    return out if rc == 0 else None


def resize_area(frame: np.ndarray, width: int, height: int) -> np.ndarray:
    """INTER_AREA-style box resize (reference video_source.py:143-148)."""
    frame = np.ascontiguousarray(frame, dtype=np.uint8)
    ch = frame.shape[2] if frame.ndim == 3 else 1
    out = np.empty((height, width, ch) if frame.ndim == 3 else (height, width), np.uint8)
    rc = _lib.fav_resize_area_u8(
        frame.ctypes.data_as(ctypes.c_void_p), frame.shape[1], frame.shape[0], ch,
        out.ctypes.data_as(ctypes.c_void_p), width, height,
    )
    if rc != 0:
        raise ValueError("resize failed")
    return out


def lib_path() -> str:
    return _LIB
