"""CIFAR-10-C-style corruption transforms — 15 corruptions x 5 severities.

The reference simulates degradation via UI sliders and canvas effects
(``platform/backend/vision_simulator.py``, ``platform/frontend/js/app.js``
noise/brightness/glitch rendering) and names the CIFAR-10-C family as the
fault-injection surface for the TPU build (SURVEY.md §2.4, BASELINE.json
configs). Here each corruption is a pure, jit-able JAX transform

    fn(key, images, severity) -> images        # severity static in 1..5

over float32 ``[B, H, W, C]`` images in [0, 1]. All randomness flows from the
explicit ``jax.random`` key (reproducible under sharding; the reference's
seeded-RNG discipline, main.py:112,327). Severity parameter tables follow the
Hendrycks & Dietterich (2019) corruption benchmark where procedurally
feasible; frost/snow/fog use procedural textures instead of bundled image
assets (zero-asset environment), and jpeg_compression is a faithful
luma/chroma 8x8 DCT quantization codec rather than a libjpeg round-trip —
each documented at the function.

Hot-path fused Pallas variants live in :mod:`fav_tpu.ops.corruptions_pallas`;
this module is the reference implementation and the equivalence-test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fav_tpu.ops.image import (
    bilinear_sample,
    blockwise_dct8,
    blockwise_idct8,
    depthwise_conv2d,
    disk_kernel,
    gaussian_blur,
    gaussian_blur_matmul,
    motion_kernel,
    resize_bilinear,
    rgb_to_gray,
)

__all__ = ["CORRUPTION_NAMES", "SEVERITIES", "apply_corruption", "corruption_fn"]
# severity tables (shared with corruptions_pallas — see block below) are
# importable but not re-exported via *

SEVERITIES = (1, 2, 3, 4, 5)


def _sev(table, severity: int):
    return table[severity - 1]


def _clip(x):
    return jnp.clip(x, 0.0, 1.0)


# ── severity tables ──────────────────────────────────────────────────────────
# Single source of truth for BOTH this oracle module and the fast-path forms
# in :mod:`fav_tpu.ops.corruptions_pallas` (Pallas kernels + MXU matmul
# variants import these): an edit to one table cannot silently diverge the
# fast path from the oracle (ADVICE r4). Values follow Hendrycks & Dietterich
# (2019) where procedurally feasible (module docstring).
GAUSSIAN_SIGMA = (0.08, 0.12, 0.18, 0.26, 0.38)
SHOT_C = (60.0, 25.0, 12.0, 5.0, 3.0)
IMPULSE_AMOUNT = (0.03, 0.06, 0.09, 0.17, 0.27)
DEFOCUS_SEV = ((3, 0.1), (4, 0.5), (6, 0.5), (8, 0.5), (10, 0.5))
GLASS_SEV = ((0.7, 1, 2), (0.9, 2, 1), (1.0, 2, 3), (1.1, 3, 2), (1.5, 4, 2))
MOTION_SEV = ((7, 3.0), (9, 5.0), (11, 7.0), (13, 9.0), (15, 12.0))
ZOOM_ZMAX = (1.11, 1.16, 1.21, 1.26, 1.31)
FOG_SEV = ((1.5, 2.0), (2.0, 2.0), (2.5, 1.7), (2.5, 1.5), (3.0, 1.4))
FROST_SEV = ((1.0, 0.4), (0.8, 0.6), (0.7, 0.7), (0.65, 0.7), (0.6, 0.75))
SNOW_SEV = (
    (0.1, 0.3, 1.6, 0.55, 2.0, 0.8),
    (0.2, 0.3, 1.8, 0.55, 2.0, 0.7),
    (0.55, 0.3, 2.0, 0.55, 2.5, 0.65),
    (0.55, 0.3, 2.0, 0.50, 3.0, 0.6),
    (0.55, 0.3, 2.2, 0.50, 3.5, 0.55),
)
BRIGHTNESS_C = (0.1, 0.2, 0.3, 0.4, 0.5)
CONTRAST_C = (0.4, 0.3, 0.2, 0.1, 0.05)


# ── noise family ───────────────────────────────────────────────────────────

def gaussian_noise(key, x, severity: int):
    sigma = _sev(GAUSSIAN_SIGMA, severity)
    return _clip(x + sigma * jax.random.normal(key, x.shape, x.dtype))


def shot_noise(key, x, severity: int):
    c = _sev(SHOT_C, severity)
    return _clip(jax.random.poisson(key, x * c, x.shape).astype(x.dtype) / c)


def impulse_noise(key, x, severity: int):
    amount = _sev(IMPULSE_AMOUNT, severity)
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, x.shape, x.dtype)
    salt = u < amount / 2
    pepper = u > 1.0 - amount / 2
    return jnp.where(salt, 1.0, jnp.where(pepper, 0.0, x))


# ── blur family ────────────────────────────────────────────────────────────

@functools.lru_cache(maxsize=None)
def _disk(radius, alias):
    return disk_kernel(radius, alias)


def defocus_blur(key, x, severity: int):
    radius, alias = _sev(DEFOCUS_SEV, severity)
    return _clip(depthwise_conv2d(x, jnp.asarray(_disk(radius, alias))))


def _local_resample(key, x, max_delta: int):
    """Random local resample x[y+dy, x+dx] with border clamping, expressed as
    (2m+1)^2 shifted-window selects over an edge-padded copy instead of a
    per-pixel gather. Exactly equivalent (clamped index == edge padding) but
    stays on the VPU — TPU gathers serialize and were ~25x slower here."""
    b, h, w, _ = x.shape
    m = max_delta
    d = jax.random.randint(key, (b, h, w, 2), -m, m + 1)
    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (0, 0)), mode="edge")
    out = jnp.zeros_like(x)
    for dy in range(-m, m + 1):
        for dx in range(-m, m + 1):
            shifted = xp[:, m + dy : m + dy + h, m + dx : m + dx + w, :]
            mask = (d[..., 0] == dy) & (d[..., 1] == dx)
            out = jnp.where(mask[..., None], shifted, out)
    return out


def glass_blur(key, x, severity: int):
    """Gaussian blur + iterated random neighbor displacement (random local
    resampling — the canonical per-pixel swap loop has no SPMD form; this is
    the standard vectorized approximation)."""
    sigma, max_delta, iters = _sev(GLASS_SEV, severity)
    x = gaussian_blur(x, sigma)
    for i in range(iters):
        key, k = jax.random.split(key)
        x = _local_resample(k, x, max_delta)
    return _clip(gaussian_blur(x, sigma))


@functools.lru_cache(maxsize=None)
def _motion(length, sigma, angle):
    return motion_kernel(length, angle, sigma)


def motion_blur(key, x, severity: int):
    """Directional streak. The streak angle is drawn per batch from the key
    (the canonical benchmark samples an angle per image)."""
    length, sigma = _sev(MOTION_SEV, severity)
    angles = np.linspace(-45.0, 45.0, 8)
    kernels = jnp.stack([jnp.asarray(_motion(length, sigma, a)) for a in angles])
    idx = jax.random.randint(key, (), 0, len(angles))
    kernel = kernels[idx]
    ph = kernel.shape[0] // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (ph, ph), (0, 0)), mode="reflect")
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel.astype(x.dtype)[:, :, None, None], kernel.shape + (1, c))
    out = jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c
    )
    return _clip(out)


def zoom_blur(key, x, severity: int):
    zmax = _sev(ZOOM_ZMAX, severity)
    b, h, w, c = x.shape
    steps = 8
    acc = x
    for i in range(1, steps + 1):
        z = 1.0 + (zmax - 1.0) * i / steps
        zh, zw = int(round(h * z)), int(round(w * z))
        zoomed = resize_bilinear(x, zh, zw)
        top, left = (zh - h) // 2, (zw - w) // 2
        acc = acc + zoomed[:, top : top + h, left : left + w, :]
    return _clip(acc / (steps + 1))


# ── weather family (procedural — no bundled texture assets) ───────────────

def _turbulence(key, batch, h, w, dtype, octaves=4, persistence=0.6):
    """Multi-octave value noise in [0,1] via iterative bilinear upsampling."""
    total = jnp.zeros((batch, h, w, 1), dtype)
    amp, norm = 1.0, 0.0
    for o in range(octaves):
        key, k = jax.random.split(key)
        res = max(2, 2 ** (o + 1))
        coarse = jax.random.uniform(k, (batch, min(res, h), min(res, w), 1), dtype)
        total = total + amp * resize_bilinear(coarse, h, w)
        norm += amp
        amp *= persistence
    return total / norm


def fog(key, x, severity: int):
    strength, decay = _sev(FOG_SEV, severity)
    b, h, w, _ = x.shape
    plasma = _turbulence(key, b, h, w, x.dtype, octaves=5, persistence=1.0 / decay)
    plasma = plasma - jnp.min(plasma, axis=(1, 2, 3), keepdims=True)
    plasma = plasma / (jnp.max(plasma, axis=(1, 2, 3), keepdims=True) + 1e-6)
    maxval = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    out = x + strength * plasma
    return _clip(out * maxval / (maxval + strength))


def frost(key, x, severity: int):
    """Procedural frost: sharp banded value-noise crystals composited over the
    image (the canonical benchmark pastes photos of frosted glass; this uses
    an on-device texture of equivalent statistics)."""
    img_w, frost_w = _sev(FROST_SEV, severity)
    b, h, w, _ = x.shape
    tex = _turbulence(key, b, h, w, x.dtype, octaves=5, persistence=0.7)
    tex = jnp.abs(jnp.sin(tex * 9.0)) ** 2  # crystalline banding
    return _clip(img_w * x + frost_w * tex)


def snow(key, x, severity: int):
    loc, scale, zoom, thresh, blur_sigma, blend = _sev(SNOW_SEV, severity)
    b, h, w, _ = x.shape
    k1, k2 = jax.random.split(key)
    layer = loc + scale * jax.random.normal(k1, (b, h, w, 1), x.dtype)
    zh, zw = int(h * zoom), int(w * zoom)
    layer = resize_bilinear(layer, zh, zw)[:, :h, :w, :]
    layer = jnp.where(layer < thresh, 0.0, layer)
    # streak the flakes diagonally
    kern = jnp.asarray(_motion(9, blur_sigma, -60.0))
    layer = depthwise_conv2d(layer, kern)
    layer = _clip(layer)
    gray = rgb_to_gray(x)
    darkened = jnp.maximum(x, gray * 1.5 + 0.5)
    base = blend * x + (1.0 - blend) * darkened
    return _clip(base + layer + jnp.flip(layer, axis=(1, 2)) * 0.5)


# ── digital family ─────────────────────────────────────────────────────────

def brightness(key, x, severity: int):
    c = _sev(BRIGHTNESS_C, severity)
    return _clip(x + c)


def contrast(key, x, severity: int):
    c = _sev(CONTRAST_C, severity)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return _clip((x - mean) * c + mean)


_ELASTIC_SEV = [(1.5, 6.0), (2.5, 5.0), (3.5, 4.5), (4.5, 4.0), (6.0, 3.5)]


def _elastic_fields(key, x, severity: int):
    """Clamped absolute sample coordinates (ys, xs) for the elastic warp."""
    alpha, sigma = _sev(_ELASTIC_SEV, severity)
    b, h, w, _ = x.shape
    k1, k2 = jax.random.split(key)
    # banded-matmul blur: the 1-channel field degenerates a depthwise conv
    # to VPU scalar work (40+ ms at sigma 6); the MXU form is ~free
    dy = gaussian_blur_matmul(jax.random.uniform(k1, (b, h, w, 1), x.dtype, -1.0, 1.0), sigma) * alpha
    dx = gaussian_blur_matmul(jax.random.uniform(k2, (b, h, w, 1), x.dtype, -1.0, 1.0), sigma) * alpha
    yy, xx = jnp.mgrid[0:h, 0:w]
    ys = jnp.clip(yy[None].astype(x.dtype) + dy[..., 0], 0.0, h - 1.0)
    xs = jnp.clip(xx[None].astype(x.dtype) + dx[..., 0], 0.0, w - 1.0)
    return ys, xs


def _elastic_transform_gather(key, x, severity: int):
    """Reference formulation (gather-based bilinear warp) — kept as the
    equivalence-test oracle for the shift-window version below."""
    ys, xs = _elastic_fields(key, x, severity)
    return jax.vmap(bilinear_sample)(x, ys, xs)


def elastic_transform(key, x, severity: int):
    """Smooth random displacement field + bilinear warp, gather-free.

    TPU gathers serialize (the round-1 gather path ran ~76 ms at batch
    2048 — 20x the other cells). Because the blurred displacement is bounded
    by alpha, clamp+bilinear is EXACTLY a tent-weighted sum over the
    (2m+2)^2 integer shifts of the edge-padded image:

        out[i,j] = sum_o tent(ys-i-oy) * tent(xs-j-ox) * pad[i+oy, j+ox]

    (for out-of-range coords every tent neighbor clamps to the same edge
    pixel and the weights sum to 1, reproducing the clamped sample). A
    ``lax.scan`` over the offset list keeps the compiled graph ~3 ops per
    offset — round 1's fully-unrolled 100-window attempt crashed the
    compiler at batch 2048; the scan form compiles in seconds and runs
    bandwidth-bound.
    """
    alpha, _ = _sev(_ELASTIC_SEV, severity)
    b, h, w, c = x.shape
    ys, xs = _elastic_fields(key, x, severity)
    yy, xx = jnp.mgrid[0:h, 0:w]
    dy = ys - yy[None].astype(x.dtype)  # bounded by alpha
    dx = xs - xx[None].astype(x.dtype)

    m = int(np.ceil(alpha))
    p = m + 1  # tent support offsets live in [-m, m+1]
    pad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    offs = np.arange(-m, m + 2)

    # scan over y-offsets (compact graph, compiler-safe at any batch) with
    # the x-offsets unrolled inside: the accumulator is read/written once
    # per Y offset instead of once per (oy, ox) pair — ~5x less HBM traffic
    def step(acc, oy):
        zero = jnp.int32(0)
        rows = jax.lax.dynamic_slice(
            pad, (zero, jnp.int32(p) + oy, zero, zero), (b, h, w + 2 * p, c)
        )
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - oy.astype(x.dtype)))
        total = jnp.zeros_like(x)
        for ox in offs:  # static column slices of the row band
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - float(ox)))
            total = total + wx[..., None] * rows[:, :, p + ox : p + ox + w, :]
        return acc + wy[..., None] * total, None

    out, _ = jax.lax.scan(step, jnp.zeros_like(x), jnp.asarray(offs, jnp.int32))
    return out


def pixelate(key, x, severity: int):
    frac = _sev([0.6, 0.5, 0.4, 0.3, 0.25], severity)
    b, h, w, c = x.shape
    lh, lw = max(1, int(h * frac)), max(1, int(w * frac))
    small = resize_bilinear(x, lh, lw)
    return jax.image.resize(small, x.shape, method="nearest")


# JPEG luminance quantization table (Annex K) — scaled by quality below.
_JPEG_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.float32,
)
_JPEG_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    np.float32,
)


def _quality_scale(q: int) -> float:
    return (5000.0 / q if q < 50 else 200.0 - 2.0 * q) / 100.0


def jpeg_compression(key, x, severity: int):
    """On-device JPEG codec round-trip (RGB->YCbCr, 8x8 DCT, Annex-K
    quantization at the severity's quality factor, inverse). No entropy
    coding — quantization is what creates the visible artifact. Runs as
    batched 8x8 matmuls on the MXU."""
    quality = _sev([25, 18, 15, 10, 7], severity)
    b, h, w, c = x.shape
    ph, pw = (-h) % 8, (-w) % 8
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge") * 255.0

    r, g, bch = xp[..., 0], xp[..., 1], xp[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * bch - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * bch
    cr = 0.5 * r - 0.418688 * g - 0.081312 * bch

    s = _quality_scale(quality)
    qy = jnp.asarray(np.clip(np.floor(_JPEG_Q_LUMA * s + 0.5), 1, 255), x.dtype)
    qc = jnp.asarray(np.clip(np.floor(_JPEG_Q_CHROMA * s + 0.5), 1, 255), x.dtype)

    def codec(chan, q):
        coef = blockwise_dct8(chan)
        hb, wb = coef.shape[-2] // 8, coef.shape[-1] // 8
        qt = jnp.tile(q, (hb, wb))
        return blockwise_idct8(jnp.round(coef / qt) * qt)

    y = codec(y, qy) + 128.0
    cb = codec(cb, qc)
    cr = codec(cr, qc)

    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bch = y + 1.772 * cb
    out = jnp.stack([r, g, bch], axis=-1)[:, :h, :w, :] / 255.0
    return _clip(out)


CORRUPTIONS = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "defocus_blur": defocus_blur,
    "glass_blur": glass_blur,
    "motion_blur": motion_blur,
    "zoom_blur": zoom_blur,
    "snow": snow,
    "frost": frost,
    "fog": fog,
    "brightness": brightness,
    "contrast": contrast,
    "elastic_transform": elastic_transform,
    "pixelate": pixelate,
    "jpeg_compression": jpeg_compression,
}

CORRUPTION_NAMES = tuple(CORRUPTIONS)


def corruption_fn(name: str):
    return CORRUPTIONS[name]


@functools.partial(jax.jit, static_argnums=(0, 3))
def apply_corruption(name: str, key: jax.Array, images: jax.Array, severity: int) -> jax.Array:
    """Jitted dispatcher: ``apply_corruption('fog', key, imgs, 3)``."""
    return CORRUPTIONS[name](key, images, severity)
