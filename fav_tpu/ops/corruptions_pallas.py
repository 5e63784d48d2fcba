"""Pallas TPU kernels for the hot corruption transforms.

SURVEY.md §2.4 mandate: corruption transforms "fused into the input
pipeline" as on-device kernels. The jnp implementations in
:mod:`fav_tpu.ops.corruptions` are the oracles; these kernels replace the
ALU-heavy threefry RNG with the TPU's hardware PRNG
(``pltpu.prng_random_bits``) and fuse noise + photometric ops + clip into a
single VMEM pass — the jnp gaussian path spends ~10x the memory-bound cost
on counter-based RNG alone (measured: 3.2 ms for a 2048x32x32x3 batch that
moves only ~50 MB).

RNG note: hardware PRNG streams differ from ``jax.random`` streams by
construction, so equivalence tests are *statistical* (mean/std/salt-pepper
rates), while the photometric math (brightness/contrast/clip) is exact.
Determinism: the per-block seed is ``seed + program_id``, so results are
reproducible for a given (seed, shape, block) and independent of grid
scheduling order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "gaussian_noise_pallas",
    "impulse_noise_pallas",
    "shot_noise_pallas",
    "brightness_pallas",
    "contrast_pallas",
    "glass_blur_pallas",
    "glass_resample_pallas",
    "elastic_transform_pallas",
    "defocus_blur_matmul",
    "motion_blur_matmul",
    "zoom_blur_matmul",
    "corrupt_normalize_pallas",
    "fast_corruption_fn",
    "GAUSSIAN_SIGMA",
    "IMPULSE_AMOUNT",
    "SHOT_C",
]

# severity tables — imported from the oracle module so the fast path reads
# the SAME data (ADVICE r4: a local copy could silently diverge between the
# sampled parity tests)
from fav_tpu.ops.corruptions import (  # noqa: E402 — after pallas imports
    BRIGHTNESS_C,
    CONTRAST_C,
    DEFOCUS_SEV,
    FOG_SEV,
    FROST_SEV,
    GAUSSIAN_SIGMA,
    GLASS_SEV,
    IMPULSE_AMOUNT,
    MOTION_SEV,
    SHOT_C,
    SNOW_SEV,
    ZOOM_ZMAX,
)

_BLOCK = 128  # images per grid step: 128*32*32*3*4B = 1.5 MB in VMEM
# (in+out double-buffered plus PRNG intermediates lands ~6 buffers of block
# size in scoped VMEM; 256-image blocks overflow the 16 MB budget at large
# batch counts)


def _uniform01(shape):
    """random bits -> float32 uniform in (0, 1): 24 mantissa bits, offset so
    0 is excluded (log() safety). prng_random_bits yields *signed* int32 —
    bitcast to uint32 before shifting or negatives survive the shift and
    poison log()."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # logical-shift down to 24 bits, then bitcast to int32 (now non-negative)
    # for the int->float cast — Mosaic has no uint32->f32 conversion
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _standard_normal(shape):
    """Box-Muller from two hardware-PRNG uniforms."""
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * jnp.pi) * u2)


def _gaussian_kernel(seed_ref, x_ref, out_ref, *, sigma):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]
    z = _standard_normal(x.shape)
    out_ref[:] = jnp.clip(x + sigma * z, 0.0, 1.0)


def _impulse_kernel(seed_ref, x_ref, out_ref, *, amount):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]
    u = _uniform01(x.shape)
    out_ref[:] = jnp.where(u < amount / 2, 1.0, jnp.where(u > 1.0 - amount / 2, 0.0, x))


def _shot_kernel(seed_ref, x_ref, out_ref, *, c, k_max):
    """Poisson sampling by inverse CDF in log space: count how many CDF
    partial sums the uniform draw exceeds. log pmf recurrences
    (log p_{k+1} = log p_k + ln(lambda) - ln(k+1)) stay finite where the
    naive pmf recurrence underflows to an absorbing 0 for lambda ~ 60.
    k_max is static per severity (~lambda + 10*sqrt(lambda))."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]
    lam = x * c
    u = _uniform01(x.shape)
    log_lam = jnp.log(jnp.maximum(lam, 1e-30))  # lam=0 handled by k=0 term
    log_term = -lam  # log pmf(0)
    cdf = jnp.exp(log_term)
    count = jnp.zeros_like(x)
    for k in range(1, k_max):
        count = count + (u > cdf).astype(jnp.float32)
        log_term = log_term + log_lam - float(np.log(k))
        cdf = cdf + jnp.exp(log_term)
    count = count + (u > cdf).astype(jnp.float32)
    out_ref[:] = jnp.clip(count / c, 0.0, 1.0)


def _corrupt_normalize_kernel(seed_ref, x_ref, out_ref, *, sigma, bright, contrast, mean, scale):
    """Input-pipeline fusion: noise + brightness + contrast + normalize in one
    pass. out = ((clip((x - mu)*contrast + mu + bright + sigma*z) - mean) * scale).
    Blocks are (images, pixels*channels); mu is the per-image mean."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]
    mu = jnp.mean(x, axis=1, keepdims=True)
    y = (x - mu) * contrast + mu + bright
    if sigma > 0.0:
        y = y + sigma * _standard_normal(x.shape)
    y = jnp.clip(y, 0.0, 1.0)
    out_ref[:] = (y - mean) * scale


def _photometric_kernel(seed_ref, x_ref, out_ref, *, bright, contrast):
    """Digital-family photometric cell: out = clip((x - mu)*contrast + mu + b).

    No PRNG — this kernel is *exactly* the jnp oracle's math
    (corruptions.brightness/contrast), so its equivalence test is bitwise-
    tolerant rather than statistical. contrast==1 skips the mean entirely so
    brightness stays exact (no (x-mu)+mu round-trip)."""
    x = x_ref[:]
    if contrast != 1.0:
        mu = jnp.mean(x, axis=1, keepdims=True)
        x = (x - mu) * contrast + mu
    out_ref[:] = jnp.clip(x + bright, 0.0, 1.0)


def _grid_call(kernel, x, seed, interpret):
    """Run an elementwise kernel over (block, D) windows.

    Images are flattened to (B, H*W*C) so the VMEM lane dimension is the
    128-aligned pixel axis — blocking the raw NHWC layout would make C=3 the
    lane dim and pad every 3-vector to 128 lanes (a 42x VMEM blowup that
    exceeds the 128 MB window budget at batch 2048).
    """
    shape = x.shape
    b = shape[0]
    d = 1
    for s in shape[1:]:
        d *= s
    block = min(_BLOCK, b)
    if b % block:
        raise ValueError(f"batch {b} not divisible by block {block}")
    flat = x.astype(jnp.float32).reshape(b, d)
    out = pl.pallas_call(
        kernel,
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        # plain interpret mode has no lowering for prng_seed on CPU — the TPU
        # interpreter (InterpretParams) emulates it (bits come out zero, so
        # CPU tests only cover the deterministic math)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)), flat)
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("severity", "interpret"))
def gaussian_noise_pallas(seed, x, severity: int = 3, interpret: bool = False):
    """Hardware-PRNG gaussian noise, fused add+clip (oracle:
    corruptions.gaussian_noise)."""
    k = functools.partial(_gaussian_kernel, sigma=GAUSSIAN_SIGMA[severity - 1])
    return _grid_call(k, x, seed, interpret)


@functools.partial(jax.jit, static_argnames=("severity", "interpret"))
def impulse_noise_pallas(seed, x, severity: int = 3, interpret: bool = False):
    """Hardware-PRNG salt & pepper (oracle: corruptions.impulse_noise)."""
    k = functools.partial(_impulse_kernel, amount=IMPULSE_AMOUNT[severity - 1])
    return _grid_call(k, x, seed, interpret)


@functools.partial(jax.jit, static_argnames=("severity", "interpret"))
def shot_noise_pallas(seed, x, severity: int = 3, interpret: bool = False):
    """Hardware-PRNG Poisson shot noise (oracle: corruptions.shot_noise;
    equality is distributional — same mean/variance law, different stream)."""
    import math

    c = SHOT_C[severity - 1]
    k_max = int(c + 10.0 * math.sqrt(c)) + 8
    k = functools.partial(_shot_kernel, c=c, k_max=k_max)
    return _grid_call(k, x, seed, interpret)


@functools.partial(
    jax.jit, static_argnames=("sigma", "bright", "contrast", "mean", "scale", "interpret")
)
def corrupt_normalize_pallas(
    seed,
    x,
    sigma: float = 0.0,
    bright: float = 0.0,
    contrast: float = 1.0,
    mean: float = 0.0,
    scale: float = 1.0,
    interpret: bool = False,
):
    """Fused corruption + normalization for the training/serving input
    pipeline: one HBM round trip for what would otherwise be 4 elementwise
    passes."""
    k = functools.partial(
        _corrupt_normalize_kernel,
        sigma=sigma, bright=bright, contrast=contrast, mean=mean, scale=scale,
    )
    return _grid_call(k, x, seed, interpret)


@functools.partial(jax.jit, static_argnames=("severity", "interpret"))
def brightness_pallas(seed, x, severity: int = 3, interpret: bool = False):
    """Exact Pallas brightness cell (oracle: corruptions.brightness)."""
    k = functools.partial(_photometric_kernel, bright=BRIGHTNESS_C[severity - 1], contrast=1.0)
    return _grid_call(k, x, seed, interpret)


@functools.partial(jax.jit, static_argnames=("severity", "interpret"))
def contrast_pallas(seed, x, severity: int = 3, interpret: bool = False):
    """Exact Pallas contrast cell with the per-image mean reduced in-kernel
    (oracle: corruptions.contrast)."""
    k = functools.partial(_photometric_kernel, bright=0.0, contrast=CONTRAST_C[severity - 1])
    return _grid_call(k, x, seed, interpret)


# glass_blur severity table — alias of the oracle's (single source of truth)
GLASS_PARAMS = GLASS_SEV

_GLASS_BLOCK = 32  # images per grid step, planar (nb, C, H, W) blocks


def _shift1(x, d, axis):
    """Edge-clamped static shift along ``axis``: out[..., i, ...] =
    x[..., clamp(i + d), ...] — concat of a slice and a broadcast edge
    slab; no gathers, no pads."""
    if d == 0:
        return x
    n = x.shape[axis]

    def sl(lo, hi):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(lo, hi)
        return x[tuple(idx)]

    shape = list(x.shape)
    shape[axis] = abs(d)
    if d > 0:
        return jnp.concatenate([sl(d, n), jnp.broadcast_to(sl(n - 1, n), shape)], axis=axis)
    return jnp.concatenate([jnp.broadcast_to(sl(0, 1), shape), sl(0, n + d)], axis=axis)


def _resample_axis(x, u, m, axis):
    """Random local resample along one spatial axis: each pixel pulls from a
    uniform offset in [-m, m] (edge-clamped), as a (2m+1)-way masked select.
    ``u`` is a per-pixel uniform shared across channels (broadcasts over the
    channel dim)."""
    k = 2 * m + 1
    code = jnp.minimum(jnp.floor(u * k), float(k - 1))
    acc = jnp.zeros_like(x)
    for t, d in enumerate(range(-m, m + 1)):
        acc = jnp.where(code == float(t), _shift1(x, d, axis), acc)
    return acc


def _glass_kernel(seed_ref, x_ref, out_ref, *, m, iters):
    """Iterated random neighbor displacement for glass_blur, in VMEM.

    The jnp oracle (corruptions._local_resample) materializes a (B, H, W, 2)
    randint field in HBM and runs (2m+1)^2 shifted-window selects per
    iteration; here the displacement comes from the hardware PRNG in-kernel
    and the select is separable — a row pass then a column pass, 2(2m+1)
    selects total. Each output pixel still gets an independent uniform
    (dy, dx) pair (the marginal law matches the oracle; outputs whose column
    draws collide share a row draw — a second-order coupling the
    "statistically equal" contract of this module's PRNG kernels covers).
    Channels move together: one per-pixel draw broadcasts over the channel
    dim of the planar (nb, C, H, W) block."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]
    nb, c, h, w = x.shape
    for _ in range(iters):
        uy = _uniform01((nb, 1, h, w))
        x = _resample_axis(x, uy, m, axis=2)
        ux = _uniform01((nb, 1, h, w))
        x = _resample_axis(x, ux, m, axis=3)
    out_ref[:] = x


def _glass_kernel_packed(seed_ref, x_ref, out_ref, *, m, iters, w):
    """Lane-packed variant of :func:`_glass_kernel`: the block is
    (nb, C, H, G*W) with G images side by side in the lane dim, so a 32-wide
    image no longer wastes 3/4 of every 128-lane vreg (the unpacked kernel's
    dominant cost — all selects/compares ran at 25% lane occupancy).

    The column resample can't use edge-clamped shifts across the packed axis
    (they'd leak pixels between images); instead the OFFSET is clamped per
    lane — ``d_eff = clip(code, -j, W-1-j)`` for lane-local column j — which
    is algebraically the oracle's ``src = clamp(j+d, 0, W-1)``, and then a
    circular :func:`pltpu.roll` is safe: the clipped offset never crosses a
    segment boundary, so the wrap-around lanes are never selected. Exactness
    of the boundary math is pinned packed-vs-unpacked in interpret mode
    (where the stubbed PRNG makes every draw the extreme offset -m)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]
    nb, c, h, gw = x.shape
    k = 2 * m + 1
    # Mosaic's tpu.iota is integer-only — build the lane index as int32 and
    # cast (CPU interpret mode accepts a float iota; hardware rejects it)
    col = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, gw), 3) % w).astype(
        jnp.float32
    )
    for _ in range(iters):
        uy = _uniform01((nb, 1, h, gw))
        x = _resample_axis(x, uy, m, axis=2)  # rows: H is not packed
        ux = _uniform01((nb, 1, h, gw))
        code = jnp.minimum(jnp.floor(ux * k), float(k - 1)) - float(m)
        d_eff = jnp.clip(code, -col, float(w - 1) - col)
        acc = jnp.zeros_like(x)
        for d in range(-m, m + 1):
            # roll by (-d mod GW) (pltpu.roll wants shift >= 0):
            # rolled[..., j] == x[..., j + d (mod GW)]; selected only where
            # j + d_eff stays inside lane j's own W-segment
            rolled = pltpu.roll(x, (-d) % gw, axis=3)
            acc = jnp.where(d_eff == float(d), rolled, acc)
        x = acc
    out_ref[:] = x


def glass_resample_pallas(seed, x, max_delta: int, iters: int, interpret: bool = False,
                          packed: bool = False):
    """Pallas iterated local resample on a [B, H, W, C] batch (planar blocks).

    ``packed=True`` lane-packs G images per 128-lane vreg — measured NEGATIVE
    at megastep level (869k vs 903k img/s unpacked, interleaved same-session
    A/B, BENCH.md round 5): the HBM pack/unpack transposes cost more than the
    lane-occupancy win. Kept for the A/B record; default ships unpacked."""
    b, h, w, c = x.shape
    g = max(1, 128 // w) if packed else 1
    while g > 1 and b % g:
        g -= 1  # any divisor of B packs; partial packing still wins lanes
    if g > 1:
        nb = max(1, _GLASS_BLOCK // g)  # same images/step as unpacked
        while nb > 1 and (b // g) % nb:
            nb //= 2
        xp = x.astype(jnp.float32).transpose(0, 3, 1, 2)  # (B, C, H, W)
        xp = (
            xp.reshape(b // g, g, c, h, w)
            .transpose(0, 2, 3, 1, 4)
            .reshape(b // g, c, h, g * w)
        )
        kernel = functools.partial(
            _glass_kernel_packed, m=int(max_delta), iters=int(iters), w=w
        )
        out = pl.pallas_call(
            kernel,
            grid=((b // g) // nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((nb, c, h, g * w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nb, c, h, g * w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xp.shape, jnp.float32),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)), xp)
        out = (
            out.reshape(b // g, c, h, g, w)
            .transpose(0, 3, 1, 2, 4)
            .reshape(b, c, h, w)
        )
        return out.transpose(0, 2, 3, 1)
    block = _GLASS_BLOCK
    while block > 1 and b % block:
        block //= 2
    xp = x.astype(jnp.float32).transpose(0, 3, 1, 2)  # (B, C, H, W)
    kernel = functools.partial(_glass_kernel, m=int(max_delta), iters=int(iters))
    out = pl.pallas_call(
        kernel,
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block, c, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)), xp)
    return out.transpose(0, 2, 3, 1)


@functools.partial(jax.jit, static_argnames=("severity", "interpret", "packed"))
def glass_blur_pallas(seed, x, severity: int = 3, interpret: bool = False,
                      packed: bool = False):
    """glass_blur with the resample iterations as a Pallas kernel (oracle:
    corruptions.glass_blur). The two Gaussian blurs stay XLA separable convs
    — that is the MXU-correct tool; Pallas replaces only the PRNG-driven
    select cascade XLA lowers badly (HBM randint field + 75 masked windows)."""
    sigma, m, iters = GLASS_PARAMS[severity - 1]
    from fav_tpu.ops.image import gaussian_blur_matmul

    # banded-matmul blur, not a depthwise conv: 3-channel 32x32 depthwise
    # convs are VPU scalar work (same finding as the defocus/motion/zoom
    # rewrites below); bitwise-equal to gaussian_blur up to reassociation
    y = gaussian_blur_matmul(x.astype(jnp.float32), sigma)
    y = glass_resample_pallas(seed, y, m, iters, interpret, packed)
    return jnp.clip(gaussian_blur_matmul(y, sigma), 0.0, 1.0)


_ELASTIC_BLOCK = 8  # images per grid step for the elastic warp kernel


def _elastic_kernel(xpad_ref, dy_ref, dx_ref, out_ref, cols_ref, *, m, h, w):
    """Tent-weighted shift-window sum for the elastic warp, in VMEM.

    Same math as corruptions.elastic_transform's scan form: for bounded
    clamped displacements, bilinear warp == sum over (2m+2)^2 integer
    offsets of tent(dy-oy)*tent(dx-ox)*xpad[i+oy, j+ox]. The XLA scan
    re-reads/writes the accumulator from HBM per y-offset and runs on a
    C=3 lane layout; here the whole accumulation stays in VMEM on planar
    blocks. Row offsets are a ``fori_loop`` with a dynamic sublane load;
    column offsets are unrolled static lane slices."""
    p = m + 1
    n = 2 * m + 2
    dy = dy_ref[:]  # (nb, 1, h, w)
    dx = dx_ref[:]
    acc0 = jnp.zeros(out_ref.shape, out_ref.dtype)

    # hoist the lane (column) windows out of the row loop into VMEM scratch:
    # n lane relayouts total instead of n^2 — lane-offset slices are the
    # expensive shuffle on TPU; sublane (row) ref loads with pl.ds are cheap
    xpad = xpad_ref[:]
    wxs = []
    for j, ox in enumerate(range(-m, m + 2)):
        cols_ref[j] = xpad[:, :, :, j + 1 : j + 1 + w]
        wxs.append(jnp.maximum(0.0, 1.0 - jnp.abs(dx - float(ox))))

    acc = acc0
    for i in range(n):  # static unroll: every slice is a cheap sublane slice
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - float(i - m)))
        inner = jnp.zeros_like(acc)
        for j in range(n):
            # row band at offset oy = i - m: rows [i+1, i+1+h) of the pad
            band = cols_ref[j, :, :, i + 1 : i + 1 + h, :]
            inner = inner + wxs[j] * band
        acc = acc + wy * inner
    out_ref[:] = acc


def _elastic_kernel_packed(xpad_ref, dy_ref, dx_ref, out_ref, cols_ref, *, m, h, w):
    """Lane-packed variant of :func:`_elastic_kernel`: G images share the
    lane dim in wp-wide segments (wp = w + 2p pad included), lifting lane
    occupancy from w/128 (25% at w=32) to G*wp/128 (~90%). The column
    windows become circular :func:`pltpu.roll`s by j+1 — for valid output
    columns t <= w-1 the source index t+j+1 <= wp-1 stays inside the lane's
    own segment, so no cross-image leak is ever selected; the pad lanes
    accumulate garbage and are sliced off outside the kernel. Same tent
    math, same scratch hoist (n rolls instead of n^2 relayouts)."""
    n = 2 * m + 2
    dy = dy_ref[:]  # (nb, 1, h, G*wp) — pad lanes carry garbage
    dx = dx_ref[:]
    xpad = xpad_ref[:]  # (nb, c, hp, G*wp)
    gwp = xpad.shape[3]
    wxs = []
    for j, ox in enumerate(range(-m, m + 2)):
        cols_ref[j] = pltpu.roll(xpad, (gwp - (j + 1)) % gwp, axis=3)
        wxs.append(jnp.maximum(0.0, 1.0 - jnp.abs(dx - float(ox))))
    acc = jnp.zeros(out_ref.shape, out_ref.dtype)
    for i in range(n):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - float(i - m)))
        inner = jnp.zeros_like(acc)
        for j in range(n):
            band = cols_ref[j, :, :, i + 1 : i + 1 + h, :]
            inner = inner + wxs[j] * band
        acc = acc + wy * inner
    out_ref[:] = acc


def _pack_lanes(a, g, seg):
    """(B, C, H, seg) -> (B/G, C, H, G*seg): G images side by side in lanes."""
    b, c, h, _ = a.shape
    return (
        a.reshape(b // g, g, c, h, seg)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b // g, c, h, g * seg)
    )


@functools.partial(jax.jit, static_argnames=("severity", "interpret", "packed"))
def elastic_transform_pallas(key, x, severity: int = 3, interpret: bool = False,
                             packed: bool = False):
    """elastic_transform with the warp accumulation as a Pallas kernel.

    EXACT equivalence to the oracle (corruptions.elastic_transform): the
    displacement fields use the same ``jax.random`` stream and MXU banded-
    matmul blur outside the kernel; only the tent accumulation moves into
    VMEM (lane-packed across images when shapes allow). No hardware PRNG —
    CPU interpret mode pins the full data path."""
    from fav_tpu.ops.corruptions import _ELASTIC_SEV, _elastic_fields, _sev

    alpha, _ = _sev(_ELASTIC_SEV, severity)
    b, h, w, c = x.shape
    ys, xs = _elastic_fields(key, x, severity)
    yy, xx = jnp.mgrid[0:h, 0:w]
    dy = (ys - yy[None].astype(x.dtype))[:, None]  # (B, 1, H, W) planar
    dx = (xs - xx[None].astype(x.dtype))[:, None]

    import numpy as np

    m = int(np.ceil(float(alpha)))
    p = m + 1
    xp = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (p, p), (p, p), (0, 0)), mode="edge"
    ).transpose(0, 3, 1, 2)  # (B, C, H+2p, W+2p)
    hp, wp = h + 2 * p, w + 2 * p

    g = max(1, 128 // wp) if packed else 1
    while g > 1 and b % g:
        g -= 1  # any divisor of B packs; G=2 still doubles lane occupancy
    if g > 1:
        # lane-packed path: G wp-wide segments per vreg (see
        # _elastic_kernel_packed); dy/dx pad out to wp per segment so every
        # operand shares one lane layout, valid w lanes sliced at the end
        nb = max(1, _ELASTIC_BLOCK // g)
        while nb > 1 and (b // g) % nb:
            nb //= 2
        dyp = jnp.pad(dy.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, 2 * p)))
        dxp = jnp.pad(dx.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, 2 * p)))
        kernel = functools.partial(_elastic_kernel_packed, m=m, h=h, w=w)
        out = pl.pallas_call(
            kernel,
            grid=((b // g) // nb,),
            in_specs=[
                pl.BlockSpec((nb, c, hp, g * wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1, h, g * wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1, h, g * wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nb, c, h, g * wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b // g, c, h, g * wp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2 * m + 2, nb, c, hp, g * wp), jnp.float32)],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(_pack_lanes(xp, g, wp), _pack_lanes(dyp, g, wp), _pack_lanes(dxp, g, wp))
        out = (
            out.reshape(b // g, c, h, g, wp)[..., :w]
            .transpose(0, 3, 1, 2, 4)
            .reshape(b, c, h, w)
        )
        return out.transpose(0, 2, 3, 1)

    block = _ELASTIC_BLOCK
    while block > 1 and b % block:
        block //= 2
    kernel = functools.partial(_elastic_kernel, m=m, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec((block, c, hp, wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * m + 2, block, c, hp, w), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xp, dy.astype(jnp.float32), dx.astype(jnp.float32))
    return out.transpose(0, 2, 3, 1)


def _key_to_seed(key):
    """Fold a jax PRNG key (typed or raw uint32) into the int32 seed the
    hardware PRNG takes."""
    data = key if jnp.issubdtype(key.dtype, jnp.integer) else jax.random.key_data(key)
    data = data.reshape(-1)
    return (data[0] ^ data[-1]).astype(jnp.int32)


# ── MXU banded-matmul blur variants (not Pallas — XLA matmuls) ──────────────
#
# The megastep's corruption share is dominated by the conv-blur family
# (measured same-session, tools/bench_corruption_share.py: conv blurs ~19 ms
# of the ~70 ms corruption slice at batch 6144): a [K,K] depthwise PSF over
# 32x32x3 images degenerates to VPU scalar work. These run the identical
# filters as rank-stacked banded matmuls on the MXU
# (ops/image.py:depthwise_conv2d_matmul / resize_crop_band) — exact up to
# float reassociation vs the jnp oracles (tests/test_corruptions.py).

def defocus_blur_matmul(key, x, severity: int = 3):
    """MXU form of :func:`fav_tpu.ops.corruptions.defocus_blur`."""
    from fav_tpu.ops.corruptions import _disk, _sev
    from fav_tpu.ops.image import depthwise_conv2d_matmul

    radius, alias = _sev(DEFOCUS_SEV, severity)
    return jnp.clip(depthwise_conv2d_matmul(x, _disk(radius, alias)), 0.0, 1.0)


def motion_blur_matmul(key, x, severity: int = 3):
    """MXU form of :func:`fav_tpu.ops.corruptions.motion_blur`: band factors
    for all 8 candidate streak angles are precomputed (zero-padded to a
    common rank) and the traced angle index selects on device — the SAME
    kernel the oracle would pick for this key."""
    from fav_tpu.ops.corruptions import _motion, _sev
    from fav_tpu.ops.image import svd_band_factors

    length, sigma = _sev(MOTION_SEV, severity)
    _, h, w, _ = x.shape
    angles = np.linspace(-45.0, 45.0, 8)
    factors = [svd_band_factors(_motion(length, sigma, a), h, w) for a in angles]
    rmax = max(my.shape[0] for my, _ in factors)

    def padr(m, size):
        return np.pad(m, ((0, rmax - m.shape[0]), (0, 0), (0, 0)))[None]

    mys = jnp.asarray(np.concatenate([padr(my, rmax) for my, _ in factors]), x.dtype)
    mxs = jnp.asarray(np.concatenate([padr(mx, rmax) for _, mx in factors]), x.dtype)
    idx = jax.random.randint(key, (), 0, len(angles))
    out = jnp.einsum("rvh,bhwc,ruw->bvuc", mys[idx], x, mxs[idx],
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.clip(out, 0.0, 1.0)


def zoom_blur_matmul(key, x, severity: int = 3):
    """MXU form of :func:`fav_tpu.ops.corruptions.zoom_blur`: each
    resize-to-z + center-crop step is linear, so the whole 8-step pyramid
    collapses into ONE stacked einsum over precomputed row/col matrices."""
    from fav_tpu.ops.corruptions import _sev
    from fav_tpu.ops.image import resize_crop_band

    zmax = _sev(ZOOM_ZMAX, severity)
    _, h, w, _ = x.shape
    steps = 8
    rys, rxs = [], []
    for i in range(1, steps + 1):
        z = 1.0 + (zmax - 1.0) * i / steps
        zh, zw = int(round(h * z)), int(round(w * z))
        rys.append(resize_crop_band(h, zh, (zh - h) // 2))
        rxs.append(resize_crop_band(w, zw, (zw - w) // 2))
    ry = jnp.asarray(np.stack(rys), x.dtype)
    rx = jnp.asarray(np.stack(rxs), x.dtype)
    acc = x + jnp.einsum("svh,bhwc,suw->bvuc", ry, x, rx,
                         precision=jax.lax.Precision.HIGHEST)
    return jnp.clip(acc / (steps + 1), 0.0, 1.0)


def snow_matmul(key, x, severity: int = 3):
    """MXU form of :func:`fav_tpu.ops.corruptions.snow`: the flake layer's
    zoom-resize + top-left crop runs as band matmuls and the diagonal streak
    conv (1-channel — the worst depthwise-conv degeneration) as
    rank-stacked matmuls. Same keys, same math."""
    from fav_tpu.ops.corruptions import _clip, _motion, _sev
    from fav_tpu.ops.image import depthwise_conv2d_matmul, resize_crop_band, rgb_to_gray

    loc, scale, zoom, thresh, blur_sigma, blend = _sev(SNOW_SEV, severity)
    _, h, w, _ = x.shape
    k1, _ = jax.random.split(key)
    layer = loc + scale * jax.random.normal(k1, (x.shape[0], h, w, 1), x.dtype)
    zh, zw = int(h * zoom), int(w * zoom)
    ry = jnp.asarray(resize_crop_band(h, zh, 0), x.dtype)   # rows [:h] of the zoomed layer
    rx = jnp.asarray(resize_crop_band(w, zw, 0), x.dtype)
    layer = jnp.einsum("vh,bhwc,uw->bvuc", ry, layer, rx,
                       precision=jax.lax.Precision.HIGHEST)
    layer = jnp.where(layer < thresh, 0.0, layer)
    layer = _clip(depthwise_conv2d_matmul(layer, _motion(9, blur_sigma, -60.0)))
    gray = rgb_to_gray(x)
    darkened = jnp.maximum(x, gray * 1.5 + 0.5)
    base = blend * x + (1.0 - blend) * darkened
    return _clip(base + layer + jnp.flip(layer, axis=(1, 2)) * 0.5)


def _turbulence_matmul(key, batch, h, w, dtype, octaves, persistence):
    """MXU form of :func:`fav_tpu.ops.corruptions._turbulence`: each octave's
    bilinear upsample [B, r, r, 1] -> [B, h, w, 1] runs as a pair of
    rectangular band matmuls instead of jax.image.resize's gather lowering.
    Same key schedule, same math."""
    from fav_tpu.ops.image import resize_band

    total = jnp.zeros((batch, h, w, 1), dtype)
    amp, norm = 1.0, 0.0
    for o in range(octaves):
        key, k = jax.random.split(key)
        res = max(2, 2 ** (o + 1))
        ch, cw = min(res, h), min(res, w)
        coarse = jax.random.uniform(k, (batch, ch, cw, 1), dtype)
        ry = jnp.asarray(resize_band(h, ch), dtype)
        rx = jnp.asarray(resize_band(w, cw), dtype)
        total = total + amp * jnp.einsum(
            "vh,bhwc,uw->bvuc", ry, coarse, rx, precision=jax.lax.Precision.HIGHEST
        )
        norm += amp
        amp *= persistence
    return total / norm


def fog_matmul(key, x, severity: int = 3):
    """MXU form of :func:`fav_tpu.ops.corruptions.fog` (turbulence octaves as
    band matmuls; the plasma normalization and blend are unchanged)."""
    from fav_tpu.ops.corruptions import _clip, _sev

    strength, decay = _sev(FOG_SEV, severity)
    b, h, w, _ = x.shape
    plasma = _turbulence_matmul(key, b, h, w, x.dtype, octaves=5, persistence=1.0 / decay)
    plasma = plasma - jnp.min(plasma, axis=(1, 2, 3), keepdims=True)
    plasma = plasma / (jnp.max(plasma, axis=(1, 2, 3), keepdims=True) + 1e-6)
    maxval = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    out = x + strength * plasma
    return _clip(out * maxval / (maxval + strength))


def frost_matmul(key, x, severity: int = 3):
    """MXU form of :func:`fav_tpu.ops.corruptions.frost` (turbulence octaves
    as band matmuls; crystalline banding and composite are unchanged)."""
    from fav_tpu.ops.corruptions import _clip, _sev

    img_w, frost_w = _sev(FROST_SEV, severity)
    b, h, w, _ = x.shape
    tex = _turbulence_matmul(key, b, h, w, x.dtype, octaves=5, persistence=0.7)
    tex = jnp.abs(jnp.sin(tex * 9.0)) ** 2
    return _clip(img_w * x + frost_w * tex)


def fast_corruption_fn(name: str):
    """Drop-in for :func:`fav_tpu.ops.corruptions.corruption_fn` that routes
    to the Pallas kernel when one exists (measured v5e, batch 2048: gaussian
    11x, impulse 5x) and the jnp implementation otherwise. Signature stays
    ``fn(key, x, severity)``; Pallas-backed results use the hardware PRNG
    stream (statistically, not bitwise, equal to the jnp oracle)."""
    from fav_tpu.ops.corruptions import corruption_fn as _jnp_fn

    if name == "gaussian_noise":
        return lambda key, x, severity: gaussian_noise_pallas(_key_to_seed(key), x, severity)
    if name == "impulse_noise":
        return lambda key, x, severity: impulse_noise_pallas(_key_to_seed(key), x, severity)
    if name == "shot_noise":
        return lambda key, x, severity: shot_noise_pallas(_key_to_seed(key), x, severity)
    if name == "brightness":
        return lambda key, x, severity: brightness_pallas(_key_to_seed(key), x, severity)
    if name == "contrast":
        return lambda key, x, severity: contrast_pallas(_key_to_seed(key), x, severity)
    if name == "glass_blur":
        # forwards packed= so bench.py --ab-packed can force the unpacked arm
        return lambda key, x, severity, packed=False: glass_blur_pallas(
            _key_to_seed(key), x, severity, packed=packed)
    if name == "elastic_transform":
        # takes the jax.random key directly — fields use the oracle's stream,
        # so this route is EXACTLY the jnp cell (max |diff| 0.0 on TPU)
        return elastic_transform_pallas
    if name == "defocus_blur":
        return defocus_blur_matmul
    if name == "motion_blur":
        return motion_blur_matmul
    if name == "zoom_blur":
        return zoom_blur_matmul
    if name == "snow":
        return snow_matmul
    if name == "fog":
        return fog_matmul
    if name == "frost":
        return frost_matmul
    # Remaining families (weather textures, pixelate/jpeg) are resize- and
    # DCT-shaped (already matmuls) or cheap elementwise chains; the conv
    # blurs above route to MXU banded-matmul forms instead of depthwise
    # convs (3-channel 32x32 depthwise conv = VPU scalar work). Pallas is
    # reserved for what XLA lowers badly: hardware-PRNG noise and cross-op
    # fusions with in-kernel reductions (above).
    return _jnp_fn(name)
