"""Shared image ops: blurs, resampling, warping, color transforms, DCT.

Building blocks for the corruption suite (:mod:`fav_tpu.ops.corruptions`)
and the input pipeline. Everything is pure jnp on float32 images in [0, 1],
batch-first ``[B, H, W, C]``, static shapes — XLA fuses the elementwise work
and maps the convs/DCTs onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gaussian_kernel1d",
    "gaussian_blur",
    "depthwise_conv2d",
    "disk_kernel",
    "motion_kernel",
    "resize_bilinear",
    "svd_band_factors",
    "depthwise_conv2d_matmul",
    "resize_band",
    "resize_crop_band",
    "bilinear_sample",
    "rgb_to_gray",
    "dct8_matrix",
    "blockwise_dct8",
    "blockwise_idct8",
]


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / max(sigma, 1e-6)) ** 2)
    return (k / k.sum()).astype(np.float32)


def depthwise_conv2d(x: jax.Array, kernel: jax.Array, pad_mode: str = "reflect") -> jax.Array:
    """Per-channel 2D convolution, SAME output size.

    x: [B, H, W, C]; kernel: [kh, kw] (shared across channels).
    """
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=pad_mode)
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel.astype(x.dtype)[:, :, None, None], (kh, kw, 1, c))
    return jax.lax.conv_general_dilated(
        xp,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def gaussian_blur(x: jax.Array, sigma: float, radius: int | None = None) -> jax.Array:
    """Separable Gaussian blur (two 1-D depthwise convs)."""
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    k1 = jnp.asarray(gaussian_kernel1d(sigma, radius))
    x = depthwise_conv2d(x, k1[None, :])
    return depthwise_conv2d(x, k1[:, None])


def disk_kernel(radius: int, alias_blur: float = 0.1) -> np.ndarray:
    """Filled-disk PSF for defocus blur, lightly Gaussian-smoothed."""
    size = 2 * radius + 1
    y, x = np.mgrid[-radius : radius + 1, -radius : radius + 1].astype(np.float64)
    disk = ((x**2 + y**2) <= radius**2).astype(np.float64)
    if alias_blur > 0:
        r = max(1, int(3 * alias_blur))
        g = gaussian_kernel1d(alias_blur, r).astype(np.float64)
        disk = np.apply_along_axis(lambda m: np.convolve(m, g, mode="same"), 0, disk)
        disk = np.apply_along_axis(lambda m: np.convolve(m, g, mode="same"), 1, disk)
    disk /= disk.sum()
    return disk.astype(np.float32)


def motion_kernel(length: int, angle_deg: float, sigma: float) -> np.ndarray:
    """Oriented line PSF with Gaussian intensity falloff along the streak."""
    size = length if length % 2 == 1 else length + 1
    c = size // 2
    k = np.zeros((size, size), np.float64)
    theta = np.deg2rad(angle_deg)
    dx, dy = np.cos(theta), np.sin(theta)
    ts = np.linspace(-c, c, 4 * size)
    for t in ts:
        xi, yi = c + t * dx, c + t * dy
        x0, y0 = int(np.floor(xi)), int(np.floor(yi))
        fx, fy = xi - x0, yi - y0
        w = np.exp(-0.5 * (t / max(sigma, 1e-6)) ** 2)
        for ddx, ddy, ww in ((0, 0, (1 - fx) * (1 - fy)), (1, 0, fx * (1 - fy)), (0, 1, (1 - fx) * fy), (1, 1, fx * fy)):
            if 0 <= x0 + ddx < size and 0 <= y0 + ddy < size:
                k[y0 + ddy, x0 + ddx] += w * ww
    k /= k.sum()
    return k.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _blur_band_matrix(size: int, sigma: float, radius: int) -> np.ndarray:
    """Dense banded matrix M with M[v, w] = weight of source column w in
    blurred output v, under the same reflect padding + VALID correlation as
    :func:`depthwise_conv2d`. Lets a 1-D Gaussian blur run as a matmul."""
    k = gaussian_kernel1d(sigma, radius).astype(np.float64)
    eye = np.pad(np.eye(size), ((radius, radius), (0, 0)), mode="reflect")
    cols = [np.convolve(eye[:, w], k, mode="valid") for w in range(size)]
    return np.stack(cols, axis=1).astype(np.float32)


def gaussian_blur_matmul(x: jax.Array, sigma: float, radius: int | None = None) -> jax.Array:
    """Separable Gaussian blur of [B, H, W, C] as two banded matmuls.

    Equivalent to :func:`gaussian_blur` but runs on the MXU — decisive for
    few-channel inputs (e.g. the 1-channel elastic displacement fields),
    where a depthwise conv degenerates to scalar VPU work. Only worthwhile
    for small static H/W (the dense band matrix is H×H / W×W)."""
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    _, h, w, _ = x.shape
    my = jnp.asarray(_blur_band_matrix(h, float(sigma), radius), x.dtype)
    mx = jnp.asarray(_blur_band_matrix(w, float(sigma), radius), x.dtype)
    return jnp.einsum("vh,bhwc,uw->bvuc", my, x, mx)


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    return jax.image.resize(x, x.shape[:-3] + (height, width, x.shape[-1]), method="bilinear")


# ── MXU banded-matmul forms of the hot spatial filters ─────────────────────
#
# The headline megastep is corruption-bound, not forward-bound (measured
# same-session: full 108 ms vs forward-only 29 ms at batch 6144x15 cells,
# tools/bench_corruption_share.py), and the conv-blur family is its largest
# slice. A depthwise conv with a [K, K] PSF over 32x32x3 images keeps the
# MXU idle (3 channels, tiny spatial dims -> VPU scalar work); expressing
# the same filter as dense banded H x H / W x W matmuls feeds the systolic
# array instead — the same trick :func:`gaussian_blur_matmul` plays for the
# elastic fields, generalized to NON-separable kernels via SVD: K = Σ_r
# σ_r u_r v_rᵀ, so conv(x, K) = Σ_r (col-blur u_r'…) ∘ (row-blur v_r'…),
# one stacked einsum over the ranks. Exact up to float reassociation
# (pinned vs the depthwise oracle by tests/test_corruptions.py).

_BAND_CACHE: dict = {}


def _band_matrix_1d(size: int, k: np.ndarray) -> np.ndarray:
    """Dense [size, size] matrix M with out[v] = Σ_w M[v, w] src[w] equal to
    VALID *correlation* of the reflect-padded source with 1-D kernel ``k``
    — exactly :func:`depthwise_conv2d`'s semantics along one axis."""
    radius = len(k) // 2
    eye = np.pad(np.eye(size), ((radius, radius), (0, 0)), mode="reflect")
    cols = [np.correlate(eye[:, w], k.astype(np.float64), mode="valid") for w in range(size)]
    return np.stack(cols, axis=1)


def svd_band_factors(kernel: np.ndarray, h: int, w: int, tol: float = 1e-7):
    """SVD-separate a [kh, kw] kernel into stacked band matrices
    (MY [r, h, h], MX [r, w, w]) such that depthwise_conv2d(x, kernel) ==
    einsum('rvh,bhwc,ruw->bvuc', MY, x, MX). Ranks below ``tol`` of the
    spectral mass are dropped (disk/motion PSFs are numerically low-rank)."""
    key = (kernel.tobytes(), kernel.shape, h, w, tol)
    hit = _BAND_CACHE.get(key)
    if hit is not None:
        return hit
    u, s, vt = np.linalg.svd(kernel.astype(np.float64))
    keep = s > tol * s.sum()
    u, s, vt = u[:, keep], s[keep], vt[keep]
    my = np.stack([_band_matrix_1d(h, u[:, i] * np.sqrt(s[i])) for i in range(len(s))])
    mx = np.stack([_band_matrix_1d(w, vt[i] * np.sqrt(s[i])) for i in range(len(s))])
    out = (my.astype(np.float32), mx.astype(np.float32))
    _BAND_CACHE[key] = out
    return out


def depthwise_conv2d_matmul(x: jax.Array, kernel: np.ndarray) -> jax.Array:
    """MXU form of :func:`depthwise_conv2d` (reflect padding, SAME size):
    per-channel 2-D correlation as a rank-stacked pair of banded matmuls.
    ``kernel`` must be a concrete numpy array (PSFs are trace-time static)."""
    _, h, w, _ = x.shape
    my, mx = svd_band_factors(np.asarray(kernel), h, w)
    # HIGHEST: keep f32 filter weights exact on the MXU (default TPU f32
    # matmul precision is a single bf16 pass); these einsums are HBM-bound,
    # so the extra passes are ~free
    return jnp.einsum(
        "rvh,bhwc,ruw->bvuc", jnp.asarray(my, x.dtype), x, jnp.asarray(mx, x.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.lru_cache(maxsize=64)
def resize_crop_band(size: int, zoomed: int, crop_from: int) -> np.ndarray:
    """[size, size] matrix R with (R @ src) == center-crop(rows of
    jax.image.resize(src, zoomed, 'bilinear')) — resize is linear, so its
    action on the identity IS the matrix, and the crop folds into the rows.
    Lets zoom_blur's resize+crop pyramid run as stacked matmuls."""
    eye = np.eye(size, dtype=np.float32)[None, :, :, None]  # [1, size, size, 1]
    # ensure_compile_time_eval: this runs at trace time on concrete values —
    # without it jax.image.resize is staged into the caller's jit and the
    # np.asarray below sees a tracer
    with jax.ensure_compile_time_eval():
        r = jax.image.resize(eye, (1, zoomed, size, 1), method="bilinear")
        r = np.asarray(r[0, crop_from : crop_from + size, :, 0])
    return r.astype(np.float32)


@functools.lru_cache(maxsize=64)
def resize_band(out_size: int, in_size: int, method: str = "bilinear") -> np.ndarray:
    """[out_size, in_size] matrix R with (R @ src) == jax.image.resize of the
    rows from in_size to out_size — the rectangular generalization of
    :func:`resize_crop_band` (same identity-action trick; resize is linear
    per axis, so `Ry @ X @ Rxᵀ` reproduces the 2-D resize exactly). Lets
    the `_turbulence` octave upsamples (fog/frost) run as MXU matmuls."""
    eye = np.eye(in_size, dtype=np.float32)[None, :, :, None]
    with jax.ensure_compile_time_eval():
        r = jax.image.resize(eye, (1, out_size, in_size, 1), method=method)
        r = np.asarray(r[0, :, :, 0])
    return r.astype(np.float32)


def bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample img[H,W,C] at float coords (ys, xs) [H,W] with edge clamping."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[..., None]
    fx = (xs - x0)[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def rgb_to_gray(x: jax.Array) -> jax.Array:
    """Luma (BT.601 float) from RGB, keepdims."""
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


@functools.lru_cache(maxsize=1)
def _dct8() -> np.ndarray:
    k = np.arange(8)
    n = np.arange(8)
    m = np.cos(np.pi * (2 * n[None, :] + 1) * k[:, None] / 16.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return (m * 0.5).astype(np.float32)


def dct8_matrix() -> jax.Array:
    """Orthonormal 8-point DCT-II matrix (JPEG's transform)."""
    return jnp.asarray(_dct8())


def _to_blocks8(x: jax.Array) -> jax.Array:
    """[..., H, W] -> [..., H/8, W/8, 8, 8]."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // 8, 8, w // 8, 8)
    return jnp.moveaxis(x, -3, -2)


def _from_blocks8(x: jax.Array) -> jax.Array:
    *lead, hb, wb, _, _ = x.shape
    x = jnp.moveaxis(x, -2, -3)
    return x.reshape(*lead, hb * 8, wb * 8)


def blockwise_dct8(x: jax.Array) -> jax.Array:
    """8x8 blockwise 2-D DCT of [..., H, W] (H, W multiples of 8).

    Two small matmuls per block — lands on the MXU when batched.
    """
    d = dct8_matrix().astype(x.dtype)
    blocks = _to_blocks8(x)
    return _from_blocks8(jnp.einsum("ij,...jk,lk->...il", d, blocks, d))


def blockwise_idct8(x: jax.Array) -> jax.Array:
    d = dct8_matrix().astype(x.dtype)
    blocks = _to_blocks8(x)
    return _from_blocks8(jnp.einsum("ji,...jk,kl->...il", d, blocks, d))
