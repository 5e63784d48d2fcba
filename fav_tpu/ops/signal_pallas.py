"""Fused Pallas TPU kernel for frame-quality statistics.

SURVEY.md §2.4 mandate: "Single fused Pallas kernel: conv-Laplacian +
reductions + 256-bin histogram + entropy, one HBM pass per frame batch"
(replacing the reference's per-frame cv2 calls, signal_analyzer.py:62-112).

One grid step = one frame resident in VMEM; everything is computed from that
single load:

* Laplacian variance (4-neighbor stencil, REFLECT_101 borders built with
  shifted concatenations — no conv primitive needed),
* mean brightness,
* mean |frame − prev| (freeze signal).

The 256-bin histogram entropy lives OUTSIDE the kernel as a nibble one-hot
matmul (:func:`fav_tpu.ops.signal.histogram_256`): round 1 computed it
in-kernel as a 256-iteration compare-reduce ``fori_loop`` that dominated the
whole analyzer (45-66 ms for 64 frames of 240x320 — ~1000 fps, ~30 analyzed
streams/chip). Every in-kernel MXU histogram variant crashed or timed out
the Mosaic compiler on this toolchain (3D broadcast-compare hits a layout
check; the 2D chunked form 500s in tpu_compile_helper), while the XLA
einsum form compiles instantly and runs the 16x16 contraction on the MXU.
The extra HBM pass re-reads gray (~20 MB at 64 frames, ~25 us) — noise next
to the 40+ ms it removes. Measured after the split: see BENCH.md.

The raw statistics feed the same score/status derivation as the jnp
reference (:mod:`fav_tpu.ops.signal`), which is the equivalence-test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fav_tpu.config import AnalyzerParams
from fav_tpu.ops.signal import (
    AnalyzerCarry,
    FrameMetrics,
    bgr_to_gray_cv2,
    histogram_entropy,
    init_analyzer_carry,
)

__all__ = ["frame_stats_pallas", "analyze_frames_pallas"]


def _frame_stats_kernel(gray_ref, prev_ref, has_prev_ref, out_ref):
    """Per-frame fused statistics. gray/prev are (1, H, W) int32 blocks."""
    g = gray_ref[0].astype(jnp.float32)  # (H, W)
    h, w = g.shape
    n = float(h * w)

    # ── mean brightness ──
    mean_b = jnp.sum(g) / n

    # ── Laplacian variance under REFLECT_101 (cv2 ksize=1 semantics) ──
    up = jnp.concatenate([g[1:2, :], g[:-1, :]], axis=0)
    down = jnp.concatenate([g[1:, :], g[-2:-1, :]], axis=0)
    left = jnp.concatenate([g[:, 1:2], g[:, :-1]], axis=1)
    right = jnp.concatenate([g[:, 1:], g[:, -2:-1]], axis=1)
    lap = up + down + left + right - 4.0 * g
    lap_mean = jnp.sum(lap) / n
    lap_var = jnp.sum((lap - lap_mean) ** 2) / n

    # ── freeze: mean abs diff vs previous frame ──
    p = prev_ref[0].astype(jnp.float32)
    diff = jnp.sum(jnp.abs(g - p)) / n
    # no-previous sentinel handled by caller via has_prev flag (whole array
    # lives in SMEM; index by grid position)
    mean_diff = jnp.where(has_prev_ref[pl.program_id(0)] > 0, diff, 10.0)

    # whole (B, 3) output stays resident in SMEM across the sequential grid
    # (scalar stores are SMEM-only; a (1, 3) VMEM block would violate the
    # (8, 128) minimum tile rule)
    i = pl.program_id(0)
    out_ref[i, 0] = lap_var
    out_ref[i, 1] = mean_b
    out_ref[i, 2] = mean_diff


@functools.partial(jax.jit, static_argnames=("interpret",))
def frame_stats_pallas(
    gray: jax.Array,  # int32 [B, H, W]
    prev_gray: jax.Array,  # int32 [B, H, W]
    has_prev: jax.Array,  # int32 [B] (0/1)
    interpret: bool = False,
) -> jax.Array:
    """Raw per-frame stats [B, 3]: (laplacian_var, mean_brightness,
    mean_diff) — one fused VMEM pass per frame. Entropy is computed by the
    caller via the MXU histogram (see module docstring)."""
    b, h, w = gray.shape
    return pl.pallas_call(
        _frame_stats_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # has_prev: full (B,) array
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3), jnp.float32),
        interpret=interpret,
    )(gray, prev_gray, has_prev.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def analyze_frames_pallas(
    params: AnalyzerParams,
    carry: AnalyzerCarry,
    frames_bgr: jax.Array,  # uint8 [B, H, W, 3]
    interpret: bool = False,
) -> tuple[AnalyzerCarry, FrameMetrics]:
    """Drop-in batched analyzer using the fused kernel for the heavy stats;
    score fusion / status derivation matches :func:`analyze_frame_jax`.

    Jitted as ONE program: gray conversion, the Pallas stats kernel, the MXU
    histogram and the score/status derivation dispatch together — on the
    tunneled backend each separate dispatch costs ~10 ms, which round 2
    measured dominating the un-jitted composite (64 ms vs ~2 ms fused)."""
    p = params
    gray = bgr_to_gray_cv2(frames_bgr)
    stats = frame_stats_pallas(
        gray, carry.prev_gray, carry.has_prev.astype(jnp.int32), interpret=interpret
    )
    lap_var = stats[:, 0]
    mean_brightness = stats[:, 1]
    mean_diff = stats[:, 2]
    entropy = histogram_entropy(gray)  # nibble one-hot matmul on the MXU

    clip = lambda x: jnp.clip(x, 0.0, 1.0)  # noqa: E731
    blur_score = clip(1.0 - lap_var / p.blur_baseline)
    brightness_score = clip(jnp.abs(mean_brightness - 128.0) / 128.0)

    frozen_now = carry.has_prev & (mean_diff < p.freeze_diff_threshold)
    consec = jnp.where(frozen_now, carry.consecutive_frozen + 1, 0)
    freeze_score = jnp.where(
        consec >= p.freeze_consec_needed,
        1.0,
        jnp.where(consec > 0, 0.3 * consec.astype(jnp.float32) / p.freeze_consec_needed, 0.0),
    )

    entropy_score = jnp.where(
        entropy < p.entropy_healthy_lo,
        clip((p.entropy_healthy_lo - entropy) / p.entropy_healthy_lo),
        jnp.where(
            entropy > p.entropy_healthy_hi,
            clip((entropy - p.entropy_healthy_hi) / p.entropy_hi_scale),
            0.0,
        ),
    )

    anomaly = clip(
        p.w_blur * blur_score
        + p.w_brightness * brightness_score
        + p.w_freeze * freeze_score
        + p.w_entropy * entropy_score
    )

    blank = (mean_brightness < p.blank_brightness_lo) | (mean_brightness > p.blank_brightness_hi)
    frozen = consec >= p.freeze_consec_needed
    corrupted = (entropy < p.corrupt_entropy_lo) | (entropy > p.corrupt_entropy_hi)
    status = jnp.where(
        blank, jnp.int32(2), jnp.where(frozen, jnp.int32(1), jnp.where(corrupted, jnp.int32(3), jnp.int32(0)))
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
