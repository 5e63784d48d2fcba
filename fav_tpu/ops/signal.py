"""Frame-quality signal analysis — JAX/XLA implementation.

Parity target: ``platform/backend/signal_analyzer.py``. Computes, per frame:

* **blur** — Laplacian variance vs a sharp baseline of 500
  (signal_analyzer.py:34,64-67),
* **brightness** — mean-gray deviation from 128 (signal_analyzer.py:69-73),
* **freeze** — mean |frame - prev| < 1.0 for >= 5 consecutive frames
  (signal_analyzer.py:28-29,76-98),
* **entropy** — 256-bin grayscale histogram entropy, healthy band 4.0-7.0
  (signal_analyzer.py:100-112),

fused as 0.35/0.25/0.15/0.25 into an anomaly score in [0,1]
(signal_analyzer.py:21-25,114-121), and derives a vision status with priority
BLANK > FROZEN > CORRUPTED > OK (signal_analyzer.py:145-171).

TPU-native design notes:

* grayscale uses OpenCV's exact fixed-point BT.601 arithmetic
  ``(b*3735 + g*19235 + r*9798 + 2^14) >> 15`` so rule thresholds fire on the
  same integers the CPU reference sees,
* the Laplacian is the 4-neighbor stencil (cv2 ksize=1) under REFLECT_101
  padding, expressed as shifted adds — XLA fuses it with the reductions,
* temporal state (previous gray frame, frozen-run counter) is an explicit
  :class:`AnalyzerCarry`, so the same pure function runs under the 30 Hz
  server, a ``lax.scan`` over clips, and ``vmap`` over independent streams,
* everything is batch-first ``(B, H, W, 3)`` with per-stream carries.

A fused single-pass Pallas kernel for the whole metric set lives in
:mod:`fav_tpu.ops.signal_pallas`; this module is the jnp reference and the
autodiff-friendly path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fav_tpu.config import AnalyzerParams

__all__ = [
    "AnalyzerCarry",
    "FrameMetrics",
    "SignalAnalyzer",
    "analyze_frame_jax",
    "analyze_clip",
    "init_analyzer_carry",
    "bgr_to_gray_cv2",
    "laplacian_variance",
    "histogram_256",
    "histogram_entropy",
]


class AnalyzerCarry(NamedTuple):
    prev_gray: jax.Array  # int32 [..., H, W]
    has_prev: jax.Array  # bool [...]
    consecutive_frozen: jax.Array  # int32 [...]


class FrameMetrics(NamedTuple):
    anomaly_score: jax.Array
    status: jax.Array  # int32 status code
    blur_score: jax.Array
    brightness_score: jax.Array
    freeze_score: jax.Array
    entropy_score: jax.Array
    laplacian_var: jax.Array
    mean_brightness: jax.Array
    mean_diff: jax.Array
    entropy: jax.Array
    consecutive_frozen: jax.Array


def init_analyzer_carry(height: int, width: int, batch_shape: tuple = ()) -> AnalyzerCarry:
    return AnalyzerCarry(
        prev_gray=jnp.zeros(batch_shape + (height, width), jnp.int32),
        has_prev=jnp.zeros(batch_shape, bool),
        consecutive_frozen=jnp.zeros(batch_shape, jnp.int32),
    )


def bgr_to_gray_cv2(frame_bgr: jax.Array) -> jax.Array:
    """OpenCV-exact BGR -> gray (uint8 range), returned as int32 [..., H, W].

    Matches cv2.cvtColor's fixed-point BT.601 rounding (shift-15 coefficients
    3735/19235/9798) so downstream integer thresholds (blank/freeze) agree
    with the CPU reference bit-for-bit. Max intermediate 255*32768 + 2^14
    fits int32.
    """
    f = frame_bgr.astype(jnp.int32)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    return (b * 3735 + g * 19235 + r * 9798 + (1 << 14)) >> 15


def laplacian_variance(gray: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Variance of the 4-neighbor Laplacian under REFLECT_101 padding.

    Equivalent to ``cv2.Laplacian(gray, CV_64F).var()`` (ksize=1). Expressed
    as shifted adds (no conv primitive needed for a 5-point stencil), which
    XLA fuses into a single VPU pass with the variance reduction.
    """
    g = gray.astype(dtype)
    # REFLECT_101: pad by mirroring without repeating the edge row/col
    gp = jnp.pad(g, [(0, 0)] * (g.ndim - 2) + [(1, 1), (1, 1)], mode="reflect")
    lap = (
        gp[..., :-2, 1:-1]
        + gp[..., 2:, 1:-1]
        + gp[..., 1:-1, :-2]
        + gp[..., 1:-1, 2:]
        - 4.0 * gp[..., 1:-1, 1:-1]
    )
    mean = jnp.mean(lap, axis=(-2, -1), keepdims=True)
    return jnp.mean((lap - mean) ** 2, axis=(-2, -1))


def histogram_256(gray: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Exact 256-bin histogram of int pixel values in [0, 255], [..., 256].

    Nibble decomposition turns the scatter into MXU work: with Hi/Lo the
    one-hot matrices of each pixel's high/low 4 bits,
    ``hist[hi, lo] = sum_p Hi[p, hi] * Lo[p, lo]`` — one [P,16]x[P,16]
    contraction instead of 256 compare-reduce passes or a serialized
    scatter-add. Counts are exact: the one-hot entries are 0/1 (exactly
    representable) and the MXU accumulates in float32 (exact to 2^24).
    """
    flat = gray.reshape(gray.shape[:-2] + (-1,))
    nibbles = jnp.arange(16, dtype=flat.dtype)
    hi = ((flat >> 4)[..., None] == nibbles).astype(dtype)  # [..., P, 16]
    lo = ((flat & 15)[..., None] == nibbles).astype(dtype)
    hist = jnp.einsum("...ph,...pl->...hl", hi, lo)
    return hist.reshape(hist.shape[:-2] + (256,))  # bin v = hi*16 + lo


def histogram_entropy(gray: jax.Array, dtype=jnp.float32) -> jax.Array:
    """256-bin histogram entropy in bits, matching the reference normalization
    ``h / (h.sum() + 1e-10)`` (signal_analyzer.py:101-105)."""
    hist = histogram_256(gray, dtype)
    p = hist / (jnp.sum(hist, axis=-1, keepdims=True) + 1e-10)
    plogp = jnp.where(p > 0, p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0)
    return -jnp.sum(plogp, axis=-1)


def _clip01(x):
    return jnp.clip(x, 0.0, 1.0)


@functools.partial(jax.jit, static_argnums=(0, 3))
def analyze_frame_jax(
    params: AnalyzerParams,
    carry: AnalyzerCarry,
    frame_bgr: jax.Array,  # uint8 [..., H, W, 3]
    dtype=jnp.float32,
) -> tuple[AnalyzerCarry, FrameMetrics]:
    """Analyze one frame (or a batch of frames, one per carried stream)."""
    p = params
    gray = bgr_to_gray_cv2(frame_bgr)
    gf = gray.astype(dtype)

    # 1. blur (signal_analyzer.py:64-67)
    lap_var = laplacian_variance(gray, dtype)
    blur_score = _clip01(1.0 - lap_var / p.blur_baseline)

    # 2. brightness (signal_analyzer.py:69-73)
    mean_brightness = jnp.mean(gf, axis=(-2, -1))
    brightness_score = _clip01(jnp.abs(mean_brightness - 128.0) / 128.0)

    # 3. freeze (signal_analyzer.py:76-98)
    diff = jnp.mean(jnp.abs(gf - carry.prev_gray.astype(dtype)), axis=(-2, -1))
    mean_diff = jnp.where(carry.has_prev, diff, jnp.asarray(10.0, dtype))
    frozen_now = carry.has_prev & (mean_diff < p.freeze_diff_threshold)
    consec = jnp.where(frozen_now, carry.consecutive_frozen + 1, 0)
    freeze_score = jnp.where(
        consec >= p.freeze_consec_needed,
        jnp.asarray(1.0, dtype),
        jnp.where(consec > 0, 0.3 * consec.astype(dtype) / p.freeze_consec_needed, 0.0),
    )

    # 4. entropy (signal_analyzer.py:100-112)
    entropy = histogram_entropy(gray, dtype)
    entropy_score = jnp.where(
        entropy < p.entropy_healthy_lo,
        _clip01((p.entropy_healthy_lo - entropy) / p.entropy_healthy_lo),
        jnp.where(
            entropy > p.entropy_healthy_hi,
            _clip01((entropy - p.entropy_healthy_hi) / p.entropy_hi_scale),
            jnp.asarray(0.0, dtype),
        ),
    )

    anomaly = _clip01(
        p.w_blur * blur_score
        + p.w_brightness * brightness_score
        + p.w_freeze * freeze_score
        + p.w_entropy * entropy_score
    )

    # status priority BLANK > FROZEN > CORRUPTED > OK (signal_analyzer.py:145-171)
    blank = (mean_brightness < p.blank_brightness_lo) | (mean_brightness > p.blank_brightness_hi)
    frozen = consec >= p.freeze_consec_needed
    corrupted = (entropy < p.corrupt_entropy_lo) | (entropy > p.corrupt_entropy_hi)
    status = jnp.where(
        blank,
        jnp.int32(2),
        jnp.where(frozen, jnp.int32(1), jnp.where(corrupted, jnp.int32(3), jnp.int32(0))),
    )

    new_carry = AnalyzerCarry(
        prev_gray=gray,
        has_prev=jnp.ones_like(carry.has_prev) | carry.has_prev,
        consecutive_frozen=consec,
    )
    metrics = FrameMetrics(
        anomaly_score=anomaly,
        status=status,
        blur_score=blur_score,
        brightness_score=brightness_score,
        freeze_score=freeze_score,
        entropy_score=entropy_score,
        laplacian_var=lap_var,
        mean_brightness=mean_brightness,
        mean_diff=mean_diff,
        entropy=entropy,
        consecutive_frozen=consec,
    )
    return new_carry, metrics


@functools.partial(jax.jit, static_argnums=0)
def analyze_clip(
    params: AnalyzerParams,
    frames_bgr: jax.Array,  # uint8 [T, ..., H, W, 3] (time-major)
    carry: AnalyzerCarry | None = None,
) -> tuple[AnalyzerCarry, FrameMetrics]:
    """Analyze a whole clip in one compiled scan (freeze state threads through)."""
    if carry is None:
        carry = init_analyzer_carry(frames_bgr.shape[-3], frames_bgr.shape[-2], frames_bgr.shape[1:-3])

    def step(c, frame):
        return analyze_frame_jax(params, c, frame)

    return jax.lax.scan(step, carry, frames_bgr)


class SignalAnalyzer:
    """Stateful facade matching the reference's serving API
    (signal_analyzer.py:47-143): ``analyze_frame(bgr ndarray) -> dict``.

    Internally drives the jitted JAX kernel and keeps the temporal carry.
    """

    def __init__(self, params: AnalyzerParams | None = None, height: int = 240, width: int = 320):
        self.params = params or AnalyzerParams()
        self._shape = (height, width)
        self.reset()

    def reset(self) -> None:
        self._carry = None
        self._frame_count = 0

    def analyze_frame(self, frame: np.ndarray) -> dict:
        h, w = frame.shape[0], frame.shape[1]
        if self._carry is None or self._carry.prev_gray.shape != (h, w):
            self._carry = init_analyzer_carry(h, w)
            self._carry = self._carry._replace(has_prev=jnp.asarray(False))
        self._frame_count += 1
        self._carry, m = analyze_frame_jax(self.params, self._carry, jnp.asarray(frame))
        status_names = ("VISION_OK", "VISION_FROZEN", "VISION_BLANK", "VISION_CORRUPTED")
        return {
            "anomaly_score": round(float(m.anomaly_score), 6),
            "vision_status": status_names[int(m.status)],
            "metrics": {
                "blur": round(float(m.blur_score), 4),
                "brightness": round(float(m.brightness_score), 4),
                "freeze": round(float(m.freeze_score), 4),
                "entropy": round(float(m.entropy_score), 4),
                "raw": {
                    "laplacian_var": round(float(m.laplacian_var), 2),
                    "mean_brightness": round(float(m.mean_brightness), 1),
                    "frame_diff": round(float(m.mean_diff), 2),
                    "entropy": round(float(m.entropy), 3),
                },
            },
        }
