"""Pallas TPU kernels for the AugMix affine scanline passes.

Round-3 training roofline (tools/profile_train.py): the AugMix train step
runs at ~34% of bf16 peak while fwd+bwd alone reaches 52% — the gap is the
augmentation itself (~102 ms/step at batch 4096, ~37k img/s for one view).
The cost center is :func:`fav_tpu.ops.augment._affine_scanline`: three
shear passes, each an unrolled (2m)-window select-accumulate that XLA
materializes through HBM per offset (~20+ GB of traffic per view batch at
m=18). The shear is the 1-D special case of the elastic tent-warp that
already has a VMEM kernel (fav_tpu/ops/corruptions_pallas.py:_elastic_kernel):
for per-row constant shifts, linear interpolation == sum over integer
offsets o of tent(delta - o) * xpad[..., o+m : o+m+w] — so the whole
accumulation fits in VMEM with ONE read and ONE write of the image.

Exactness: tent weights are 1-frac at floor(delta) and frac at
floor(delta)+1 and exactly 0.0 elsewhere (products vanish exactly), so the
kernel is bitwise the same arithmetic as the XLA path's
(1-frac)*lo + frac*hi — pinned by tests/test_augment.py in interpret mode.

Layout: planar (B, C, H, W) f32 (NHWC's C=3 lane dim pads to 128 — the
same rule as the other image kernels here, see CLAUDE.md). Horizontal
shifts slice the lane (W) axis, vertical shifts the sublane (H) axis.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["affine_scanline_pallas"]

_BLOCK = 8  # images per grid step (208 KB xpad block at 32x32, m=18)


def _shear_rows_kernel(xpad_ref, delta_ref, out_ref, *, m, w):
    """out[b, c, y, x] = sum_o tent(delta[b, y] - o) * xpad[b, c, y, x+o+m].

    ``delta`` enters clipped to [-m, m-1] so exactly two offsets have
    nonzero tent weight — unrolled static lane slices, all in VMEM."""
    xpad = xpad_ref[:]  # (nb, c, h, w + 2m)
    delta = delta_ref[:]  # (nb, 1, h, 1)
    acc = jnp.zeros(out_ref.shape, out_ref.dtype)
    for j in range(2 * m + 1):  # offsets o = j - m in [-m, m]
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(delta - float(j - m)))
        acc = acc + wgt * xpad[:, :, :, j : j + w]
    out_ref[:] = acc


def _shear_cols_kernel(xpad_ref, delta_ref, out_ref, *, m, h):
    """Vertical pass: out[b, c, y, x] = sum_o tent(delta[b, x] - o) *
    xpad[b, c, y+o+m, x]. Sublane slices are cheap on TPU, no scratch."""
    xpad = xpad_ref[:]  # (nb, c, h + 2m, w)
    delta = delta_ref[:]  # (nb, 1, 1, w)
    acc = jnp.zeros(out_ref.shape, out_ref.dtype)
    for j in range(2 * m + 1):
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(delta - float(j - m)))
        acc = acc + wgt * xpad[:, :, j : j + h, :]
    out_ref[:] = acc


def _block_for(b: int) -> int:
    block = _BLOCK
    while block > 1 and b % block:
        block //= 2
    return block


def _shear_pass(x, delta, m: int, axis: int, interpret: bool):
    """One shear pass on planar (B, C, H, W): ``axis=3`` shifts along W with
    per-(image, row) deltas [B, H]; ``axis=2`` shifts along H with
    per-(image, column) deltas [B, W]."""
    b, c, h, w = x.shape
    delta = jnp.clip(delta, -m, m - 1).astype(jnp.float32)
    block = _block_for(b)
    if axis == 3:
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (m, m)), mode="edge")
        kernel = functools.partial(_shear_rows_kernel, m=m, w=w)
        d4 = delta[:, None, :, None]  # (B, 1, H, 1)
        in_specs = [
            pl.BlockSpec((block, c, h, w + 2 * m), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, h, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        xp = jnp.pad(x, ((0, 0), (0, 0), (m, m), (0, 0)), mode="edge")
        kernel = functools.partial(_shear_cols_kernel, m=m, h=h)
        d4 = delta[:, None, None, :]  # (B, 1, 1, W)
        in_specs = [
            pl.BlockSpec((block, c, h + 2 * m, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, 1, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        kernel,
        grid=(b // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xp, d4)


@functools.partial(jax.jit, static_argnames=("interpret",))
def affine_scanline_pallas(
    x: jax.Array,
    theta: jax.Array,
    shear_x: jax.Array,
    shear_y: jax.Array,
    tx: jax.Array,
    ty: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in Pallas replacement for augment._affine_scanline (NHWC in/out).

    Same Paeth decomposition, same per-pass shift bounds, same clipping —
    only the accumulation moves to VMEM. One transpose to planar on entry,
    one back on exit; the three passes chain through HBM as whole images
    (3 reads + 3 writes) instead of per-offset round-trips."""
    from fav_tpu.ops.augment import _MAX_ROT, _MAX_SHEAR, _MAX_TRANSLATE

    b, h, w, c = x.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = (jnp.arange(h, dtype=jnp.float32) - cy)[None, :]  # [1, H]
    xs = (jnp.arange(w, dtype=jnp.float32) - cx)[None, :]  # [1, W]
    t_half = jnp.tan(theta / 2.0)[:, None]
    s_th = jnp.sin(theta)[:, None]
    mx = int(math.ceil((math.tan(_MAX_ROT / 2) + _MAX_SHEAR) * max(cy, 1.0)
                       + _MAX_TRANSLATE * w)) + 1
    my = int(math.ceil((math.sin(_MAX_ROT) + _MAX_SHEAR) * max(cx, 1.0)
                       + _MAX_TRANSLATE * h)) + 1

    planar = x.astype(jnp.float32).transpose(0, 3, 1, 2)  # (B, C, H, W)
    out = _shear_pass(
        planar, (-t_half + shear_x[:, None]) * ys + tx[:, None], mx, 3, interpret
    )
    out = _shear_pass(
        out, (s_th + shear_y[:, None]) * xs + ty[:, None], my, 2, interpret
    )
    out = _shear_pass(out, -t_half * ys, mx, 3, interpret)
    return out.transpose(0, 2, 3, 1)
