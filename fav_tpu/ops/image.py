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
