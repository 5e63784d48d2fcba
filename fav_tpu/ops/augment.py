"""AugMix-style on-device augmentation for corruption-robust training.

The reference trains nothing (its ML is a heuristic proxy,
reference platform/backend/anomaly_simulator.py:7-9); the TPU build's models
are evaluated on the 15x5 corruption grid (SURVEY.md §5.3), which is a
held-out *test* protocol — training on those corruptions would leak the
benchmark. AugMix (Hendrycks et al., ICLR 2020; PAPERS.md robustness line)
is the standard leak-free recipe: mix chains of mild augmentations that are
**disjoint from the test corruptions** (affine geometry, posterize,
solarize, autocontrast — no noise/blur/weather/digital cells) and train
with a Jensen-Shannon consistency term so the model's predictive
distribution is invariant to the mixing.

TPU shape (this is a redesign, not a literal AugMix transcription — the
canonical per-image op-switch chains with gather-based warps ran at 18 s
per 256-batch on TPU because ``vmap(lax.switch)`` executes every branch and
TPU gathers serialize):

* every op is **batch-first** with a per-image magnitude vector, and every
  op is the **identity at magnitude 0** — so "pick a random subset of ops
  per chain" becomes "gate each magnitude", with no control flow at all;
* the affine family (rotate/shear/translate) runs as **Paeth scanline
  shears**: a rotation is three shear passes (Paeth 1986), and a shear
  shifts each row by a *constant* per-row offset — expressible as a
  bounded shift-window select-accumulate on the VPU (the same gather-free
  trick as ``fav_tpu/ops/corruptions.py:elastic_transform``) with exact
  linear interpolation;
* all ``width`` chains of the whole batch ride ONE ``(width*B, H, W, C)``
  program: replicate, draw per-(chain, image) parameters, one pass,
  Dirichlet-mix. ~45 ms -> sub-ms per batch; no host round-trips.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

__all__ = ["augmix", "augment_op", "NUM_OPS", "js_consistency"]


def _use_pallas_affine() -> bool:
    """Opt-in (``FAV_AUGMIX_PALLAS=1``) VMEM shear kernels for the affine
    passes (fav_tpu/ops/augment_pallas.py). Measured round 3 and NOT the
    default: the same-session A/B showed the XLA select-accumulate was not
    the AugMix bottleneck after all (augmix view 104.5 vs 108.8 ms at batch
    12288) and the pallas_call boundaries cost fusion inside the full train
    step (332.7 vs 296.0 ms) — the real cost center was the Beta/Dirichlet
    rejection samplers, since replaced by closed forms at alpha=1 (see
    :func:`augmix`). Kernel + equivalence tests stay as the documented
    negative result (BENCH.md Training)."""
    return os.environ.get("FAV_AUGMIX_PALLAS", "") == "1"

# magnitude-1 ceilings for the geometry family
_MAX_ROT = math.pi / 6.0  # ±30°
_MAX_SHEAR = 0.3
_MAX_TRANSLATE = 0.25  # fraction of the image side


def _shift_rows(x: jax.Array, delta: jax.Array, max_shift: int) -> jax.Array:
    """``out[b, y, x] = in[b, y, x + delta[b, y]]`` with linear interpolation
    and edge clamping — a horizontal shear pass. ``delta`` is a float shift
    per (image, row), statically bounded by ``max_shift``.

    Implemented as a **logarithmic barrel shift**: the integer offset
    ``off = floor(delta) + m`` (in ``[0, 2m-1]``) is applied bit by bit —
    ``ceil(log2(2m))`` conditional power-of-2 slices instead of the 2·2m
    masked windows of the select-accumulate this replaced. Same arithmetic
    (bitwise-identical output, pinned by tests vs :func:`_shift_rows_windows`),
    ~13x less HBM traffic at the AugMix train shape: each stage reads+writes
    the batch once (~6 passes) where the window form carried 72 full-batch
    selects. Measured on TPU in BENCH.md (Training, round 3)."""
    b, h, w, c = x.shape
    m = int(max_shift)
    delta = jnp.clip(delta, -m, m - 1)
    lo = jnp.floor(delta).astype(jnp.int32)  # [B, H] in [-m, m-1]
    # offset math stays f32 (tiny [B, H] tensors); the interpolation weight
    # is cast to the image dtype so a bf16 image stays bf16 end to end
    frac = (delta - lo).astype(x.dtype)[:, :, None, None]
    off = lo + m  # [B, H] in [0, 2m-1]
    nbits = max(1, int(2 * m - 1).bit_length())
    # xp[b, y, i] is source column i - m, edge-replicated; width w + 2^nbits
    # so that unconditionally truncating (2^nbits - 1) columns across the
    # stages still leaves the w+1 columns the interpolation needs.
    xp = jnp.pad(x, ((0, 0), (0, 0), (m, (1 << nbits) - m), (0, 0)), mode="edge")
    cur = xp
    for k in range(nbits):
        s = 1 << k
        bit = ((off >> k) & 1).astype(bool)[:, :, None, None]
        new_w = cur.shape[2] - s
        cur = jnp.where(bit, cur[:, :, s : s + new_w, :], cur[:, :, :new_w, :])
    # cur[b, y, x] == xp[b, y, x + off[b, y]] for x in [0, w]
    return (1.0 - frac) * cur[:, :, :w, :] + frac * cur[:, :, 1 : w + 1, :]


def _shift_rows_windows(x: jax.Array, delta: jax.Array, max_shift: int) -> jax.Array:
    """The original (2M+2)-window select-accumulate form of
    :func:`_shift_rows`, kept as the independent oracle for the barrel-shift
    equivalence test (tests/test_augment.py) — do not use on the hot path."""
    b, h, w, c = x.shape
    m = int(max_shift)
    delta = jnp.clip(delta, -m, m - 1)
    lo = jnp.floor(delta).astype(jnp.int32)  # [B, H] in [-m, m-1]
    frac = (delta - lo).astype(x.dtype)[:, :, None, None]
    xp = jnp.pad(x, ((0, 0), (0, 0), (m, m), (0, 0)), mode="edge")
    acc_lo = jnp.zeros_like(x)
    acc_hi = jnp.zeros_like(x)
    for o in range(-m, m):
        mask = (lo == o)[:, :, None, None]
        acc_lo = jnp.where(mask, xp[:, :, m + o : m + o + w, :], acc_lo)
        acc_hi = jnp.where(mask, xp[:, :, m + o + 1 : m + o + 1 + w, :], acc_hi)
    return (1.0 - frac) * acc_lo + frac * acc_hi


def _shift_cols(x: jax.Array, delta: jax.Array, max_shift: int) -> jax.Array:
    """Vertical shear pass: ``out[b, y, x] = in[b, y + delta[b, x], x]``.

    Transpose + :func:`_shift_rows` + transpose back. A direct axis-1
    barrel shift (no transpose round trip) measured *slower* on TPU
    (86.5 vs 83.9 ms chain view, tools/ab_shift_rows.py 3-arm A/B) —
    XLA's transpose into the lane-friendly layout beats conditional
    slicing along the sublane axis; kept this form."""
    return _shift_rows(x.transpose(0, 2, 1, 3), delta, max_shift).transpose(0, 2, 1, 3)


def _affine_scanline(
    x: jax.Array,
    theta: jax.Array,
    shear_x: jax.Array,
    shear_y: jax.Array,
    tx: jax.Array,
    ty: jax.Array,
) -> jax.Array:
    """Batched rotate+shear+translate via three scanline passes (Paeth
    rotation decomposition: shear_x(-tan θ/2) ∘ shear_y(sin θ) ∘
    shear_x(-tan θ/2)), with the independent shear/translate knobs folded
    into the same passes. All parameter vectors are per-image ``[B]``;
    every knob at 0 is the exact identity."""
    b, h, w, c = x.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = (jnp.arange(h, dtype=jnp.float32) - cy)[None, :]  # [1, H]
    xs = (jnp.arange(w, dtype=jnp.float32) - cx)[None, :]  # [1, W]
    t_half = jnp.tan(theta / 2.0)[:, None]  # [B, 1]
    s_th = jnp.sin(theta)[:, None]

    # static shift bounds from the magnitude-1 ceilings
    mx = int(math.ceil((math.tan(_MAX_ROT / 2) + _MAX_SHEAR) * max(cy, 1.0) + _MAX_TRANSLATE * w)) + 1
    my = int(math.ceil((math.sin(_MAX_ROT) + _MAX_SHEAR) * max(cx, 1.0) + _MAX_TRANSLATE * h)) + 1

    out = _shift_rows(x, (-t_half + shear_x[:, None]) * ys + tx[:, None], mx)
    out = _shift_cols(out, (s_th + shear_y[:, None]) * xs + ty[:, None], my)
    out = _shift_rows(out, -t_half * ys, mx)
    return out


# ── pointwise ops (batched, per-image magnitude, identity at mag 0) ────────


def _posterize(x: jax.Array, mag: jax.Array) -> jax.Array:
    # 256 levels (mag 0 ~ identity for 8-bit-sourced frames) down to 4 (mag 1)
    levels = jnp.round(256.0 - 252.0 * mag)[:, None, None, None].astype(x.dtype)
    return jnp.round(x * (levels - 1.0)) / (levels - 1.0)


def _solarize(x: jax.Array, mag: jax.Array) -> jax.Array:
    # invert strictly above the threshold; thresh 1.0 (mag 0) inverts nothing
    thresh = (1.0 - 0.7 * mag)[:, None, None, None].astype(x.dtype)
    return jnp.where(x > thresh, 1.0 - x, x)


def _autocontrast(x: jax.Array, mag: jax.Array) -> jax.Array:
    lo = jnp.min(x, axis=(1, 2), keepdims=True)
    hi = jnp.max(x, axis=(1, 2), keepdims=True)
    stretched = (x - lo) / jnp.maximum(hi - lo, jnp.asarray(1e-6, x.dtype))
    return x + mag[:, None, None, None].astype(x.dtype) * (stretched - x)


def _freq_band(x: jax.Array, mag: jax.Array, key: jax.Array) -> jax.Array:
    """Frequency-band gain augmentation: scale the image's radial spectral
    octaves by random per-(image, band) gains.

    Why (round-3 weather work): the measured signature of the weather
    failure family is a *spectral* shift — fog moves the low-frequency
    energy fraction from 0.07 to 0.78-0.87 (tools/diagnose_weather.py) —
    and no AugMix op touches the spectrum, so the model never sees
    spectrally-skewed views in training. This op randomizes the band
    balance directly: FFT -> 4 octave bands (r < 1/8, 1/8-1/4, 1/4-1/2,
    > 1/2 of Nyquist) -> per-image log-uniform gains in [1/4, 4]^mag ->
    inverse FFT. The DC term keeps gain 1 (mean brightness untouched — the
    'brightness' test cell must not leak), and no corruption formula
    (turbulence/plasma, crystal banding, streak kernels) is used: this is a
    pure spectral reweighting, identity at mag 0.
    """
    b, h, w, c = x.shape
    in_dtype = x.dtype  # FFT is f32-only; upcast here, downcast on return
    f = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))  # [B, H, W//2+1, C]
    fy = jnp.minimum(jnp.arange(h), h - jnp.arange(h)).astype(jnp.float32) / (h / 2)
    fx = jnp.arange(w // 2 + 1).astype(jnp.float32) / (w / 2)
    r = jnp.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)  # [H, W//2+1], 0..~1.4
    edges = jnp.asarray([0.0, 0.125, 0.25, 0.5, 10.0])
    band = jnp.sum((r[None] >= edges[1:, None, None]), axis=0)  # [H, Wr] in 0..3
    log4 = jnp.log(4.0)
    gains = jnp.exp(
        jax.random.uniform(key, (b, 4), jnp.float32, -1.0, 1.0)
        * mag[:, None] * log4
    )  # [B, 4]
    field = gains[:, jnp.clip(band, 0, 3)]  # [B, H, W//2+1]
    field = jnp.where(r[None] == 0.0, 1.0, field)  # DC untouched
    out = jnp.fft.irfft2(f * field[..., None], s=(h, w), axes=(1, 2))
    return jnp.clip(out, 0.0, 1.0).astype(in_dtype)


def _occlude(x: jax.Array, mag: jax.Array, key: jax.Array) -> jax.Array:
    """Random rectangular occlusions (Cutout, DeVries & Taylor 2017 /
    Random Erasing, Zhong et al. 2020): blank out up to 2 axis-aligned
    rectangles per image with random constant fills.

    Why (round-3 snow work): snow is the one structural robustness floor
    (0.43-0.48 for every model, BENCH.md) and its failure mechanism is
    *occlusion* — bright streak overlays hide content. No base AugMix op
    removes information (geometry and photometrics are invertible-ish), so
    occlusion robustness is never trained. Constant-fill rectangles are the
    standard leak-free analog: no corruption formula in the 15-cell grid
    (fav_tpu/ops/corruptions.py) draws axis-aligned constant rectangles —
    snow/frost are motion-streak / crystal-texture overlays.

    TPU shape: broadcast compares build the rectangle masks — no gathers,
    no control flow. Strict ``<`` keeps exact identity at mag 0 (gated-off
    images are untouched bit-for-bit)."""
    b, h, w, _ = x.shape
    n_rect = 2
    kc, ks, kv = jax.random.split(key, 3)
    ctr = jax.random.uniform(kc, (b, n_rect, 2), jnp.float32)  # centers in [0,1]
    half = (
        jax.random.uniform(ks, (b, n_rect, 2), jnp.float32)
        * (0.30 * mag)[:, None, None]
    )  # half-extents as a fraction of the side; 0 at mag 0
    val = jax.random.uniform(kv, (b, n_rect), jnp.float32)
    ys = (jnp.arange(h, dtype=jnp.float32) / (h - 1))[None, None, :]  # [1,1,H]
    xs = (jnp.arange(w, dtype=jnp.float32) / (w - 1))[None, None, :]  # [1,1,W]
    in_y = jnp.abs(ys - ctr[:, :, 0:1]) < half[:, :, 0:1]  # [B,R,H]
    in_x = jnp.abs(xs - ctr[:, :, 1:2]) < half[:, :, 1:2]  # [B,R,W]
    out = x
    val = val.astype(x.dtype)  # constant fill in the image dtype
    for r in range(n_rect):
        m = (in_y[:, r, :, None] & in_x[:, r, None, :])[..., None]  # [B,H,W,1]
        out = jnp.where(m, val[:, r][:, None, None, None], out)
    return out


def _occlude_bars(x: jax.Array, mag: jax.Array, key: jax.Array) -> jax.Array:
    """Oriented-bar occlusions: blank out up to 3 thin *rotated* rectangles
    per image with random constant fills (Random Erasing generalized with an
    orientation — the rotated-rectangle member of the Cutout family).

    Why (round-3 snow work): snow is the one structural robustness floor
    (0.43-0.48 for every model, BENCH.md) and its failure mechanism is
    *oriented streak* occlusion; the axis-aligned rectangle op moved snow
    only +0.02-0.04. This op trains inference-from-partial-content under
    elongated occluders at arbitrary angles. Leak-freedom: the snow cell
    (fav_tpu/ops/corruptions.py:202) is an *additive* bright overlay —
    thresholded gaussian noise, zoomed, motion-blurred at a fixed -60°,
    composited over a whitened image; this op *replaces* pixels with a
    constant, draws no noise layer, no blur kernel, no whitening, and a
    uniform random angle — no formula is shared.

    TPU shape: rotated-rectangle masks from two half-plane pair compares on
    broadcast coordinate grids — no gathers, no control flow. Strict ``<``
    keeps exact identity at mag 0."""
    b, h, w, _ = x.shape
    n_bars = 3
    kc, ka, kl, kw, kv = jax.random.split(key, 5)
    ctr = jax.random.uniform(kc, (b, n_bars, 2), jnp.float32)  # (y, x) in [0,1]
    ang = jax.random.uniform(ka, (b, n_bars), jnp.float32, 0.0, math.pi)
    half_len = (
        jax.random.uniform(kl, (b, n_bars), jnp.float32) * (0.45 * mag)[:, None]
    )
    half_wid = (
        jax.random.uniform(kw, (b, n_bars), jnp.float32) * (0.08 * mag)[:, None]
    )
    val = jax.random.uniform(kv, (b, n_bars), jnp.float32)
    ys = (jnp.arange(h, dtype=jnp.float32) / (h - 1))[None, None, :, None]
    xs = (jnp.arange(w, dtype=jnp.float32) / (w - 1))[None, None, None, :]
    dy = ys - ctr[:, :, 0][:, :, None, None]  # [B, R, H, 1]
    dx = xs - ctr[:, :, 1][:, :, None, None]  # [B, R, 1, W]
    c = jnp.cos(ang)[:, :, None, None]
    s = jnp.sin(ang)[:, :, None, None]
    along = dx * c + dy * s  # [B, R, H, W]
    across = dy * c - dx * s
    out = x
    val = val.astype(x.dtype)  # constant fill in the image dtype
    for r in range(n_bars):
        m = (
            (jnp.abs(along[:, r]) < half_len[:, r, None, None])
            & (jnp.abs(across[:, r]) < half_wid[:, r, None, None])
        )[..., None]
        out = jnp.where(m, val[:, r][:, None, None, None], out)
    return out


def _signed(key, mag):
    """Magnitude in [0, 1] -> signed value in [-mag, +mag] (random direction)."""
    sign = jnp.where(jax.random.bernoulli(key, shape=mag.shape), 1.0, -1.0)
    return sign * mag


def _chain(
    key: jax.Array, x: jax.Array, gate_p: float, freq: bool = False,
    occlude: bool = False, bars: bool = False,
) -> jax.Array:
    """One augmentation chain over a batch: gate each op's magnitude per
    image (Bernoulli(gate_p) — the TPU-native form of 'random op subset'),
    then apply geometry (one 3-pass scanline affine) and the pointwise ops
    in fixed order. Gated-off ops are exact identities. ``freq=True``
    extends the op pool with the spectral band-gain op (:func:`_freq_band`,
    the weather-axis view), ``occlude=True`` with the rectangular occlusion
    op (:func:`_occlude`) and ``bars=True`` with the oriented-bar occlusion
    op (:func:`_occlude_bars`, the snow-axis views) — all opt-in so the
    base recipe stays reproducible (the key schedule below is bitwise
    unchanged when they are off)."""
    b, h, w, _ = x.shape
    n_ops = (
        NUM_OPS + (1 if freq else 0) + (1 if occlude else 0) + (1 if bars else 0)
    )
    k_gate, k_mag, k_sign, k_freq = jax.random.split(key, 4)
    k_occ = None
    if occlude:
        k_freq, k_occ = jax.random.split(k_freq)
    # fold_in keeps the split-derived schedule above bitwise stable when off
    k_bars = jax.random.fold_in(key, 7) if bars else None
    gates = jax.random.bernoulli(k_gate, gate_p, (n_ops, b)).astype(jnp.float32)
    mags = jax.random.uniform(k_mag, (n_ops, b), jnp.float32) * gates
    signs = jax.random.split(k_sign, 5)

    theta = _signed(signs[0], mags[0]) * _MAX_ROT
    sx = _signed(signs[1], mags[1]) * _MAX_SHEAR
    sy = _signed(signs[2], mags[2]) * _MAX_SHEAR
    tx = _signed(signs[3], mags[3]) * _MAX_TRANSLATE * w
    ty = _signed(signs[4], mags[4]) * _MAX_TRANSLATE * h
    if _use_pallas_affine():
        from fav_tpu.ops.augment_pallas import affine_scanline_pallas

        x = affine_scanline_pallas(x, theta, sx, sy, tx, ty)
    else:
        x = _affine_scanline(x, theta, sx, sy, tx, ty)
    x = _posterize(x, mags[5])
    x = _solarize(x, mags[6])
    x = _autocontrast(x, mags[7])
    nxt = NUM_OPS
    if freq:
        x = _freq_band(x, mags[nxt], k_freq)
        nxt += 1
    if occlude:
        x = _occlude(x, mags[nxt], k_occ)
        nxt += 1
    if bars:
        x = _occlude_bars(x, mags[nxt], k_bars)
    return x


# single-image op views (test/API surface; names define the leak-free
# contract checked against fav_tpu.ops.corruptions.CORRUPTION_NAMES)


def _geom_op(img, mag, key, which):
    z = jnp.zeros((1,), jnp.float32)
    knobs = [z, z, z, z, z]
    scale = {0: _MAX_ROT, 1: _MAX_SHEAR, 2: _MAX_SHEAR, 3: _MAX_TRANSLATE * img.shape[1], 4: _MAX_TRANSLATE * img.shape[0]}[which]
    knobs[which] = _signed(key, mag[None]) * scale
    return _affine_scanline(img[None], *knobs)[0]


def _rotate(img, mag, key):
    return _geom_op(img, mag, key, 0)


def _shear_x(img, mag, key):
    return _geom_op(img, mag, key, 1)


def _shear_y(img, mag, key):
    return _geom_op(img, mag, key, 2)


def _translate_x(img, mag, key):
    return _geom_op(img, mag, key, 3)


def _translate_y(img, mag, key):
    return _geom_op(img, mag, key, 4)


def _posterize1(img, mag, key):
    return _posterize(img[None], mag[None])[0]


def _solarize1(img, mag, key):
    return _solarize(img[None], mag[None])[0]


def _autocontrast1(img, mag, key):
    return _autocontrast(img[None], mag[None])[0]


_posterize1.__name__ = "_posterize"
_solarize1.__name__ = "_solarize"
_autocontrast1.__name__ = "_autocontrast"

_OPS = (
    _rotate,
    _shear_x,
    _shear_y,
    _translate_x,
    _translate_y,
    _posterize1,
    _solarize1,
    _autocontrast1,
)
NUM_OPS = len(_OPS)


def augment_op(idx: jax.Array, img: jax.Array, mag: jax.Array, key: jax.Array) -> jax.Array:
    """Apply op ``idx`` (traced) to one [H, W, C] image at magnitude ``mag``
    in [0, 1]. Single-image testing surface for the batched chain ops."""
    # strong f32 in, so every switch branch agrees on the output aval
    img = jax.lax.convert_element_type(img, jnp.float32)
    mag = jax.lax.convert_element_type(mag, jnp.float32)
    return jax.lax.switch(idx, _OPS, img, mag, key)


@functools.partial(
    jax.jit,
    static_argnames=("width", "max_depth", "alpha", "freq", "occlude", "bars",
                     "bf16"),
)
def augmix(
    key: jax.Array,
    images: jax.Array,
    width: int = 3,
    max_depth: int = 3,
    alpha: float = 1.0,
    freq: bool = False,
    occlude: bool = False,
    bars: bool = False,
    bf16: bool = False,
) -> jax.Array:
    """AugMix a [B, H, W, C] batch: per-image Dirichlet-weighted mixture of
    ``width`` augmentation chains, Beta-blended with the original. Chains
    gate each op with p = mean_depth / n_ops (mean_depth = E[U{1..max_depth}]),
    so expected chain depth matches the canonical sampler. ``freq=True``
    adds the spectral band-gain op to the pool (weather-axis coverage);
    ``occlude=True`` adds the rectangular occlusion op and ``bars=True``
    the oriented-bar occlusion op (snow-axis coverage).

    ``bf16=True`` runs the [width*B]-sized chain + mixing in bfloat16 (the
    augmentation is memory-bound VPU work, so halving the bytes halves the
    HBM traffic — the train step's cost profile in BENCH.md Training). All
    randomness is still drawn in f32 with the SAME key schedule, geometry
    offsets stay f32, and the output returns in the input dtype; only the
    image-sized tensors carry bf16 (~3e-3 mean deviation from the f32 path,
    pinned by tests — noise far below the augmentation's own randomness)."""
    orig_dtype = images.dtype
    images = jax.lax.convert_element_type(images, jnp.float32)
    b = images.shape[0]
    k_dir, k_beta, k_chains = jax.random.split(key, 3)
    if alpha == 1.0:
        # closed forms at the default concentration — Beta(1,1) IS U(0,1) and
        # Dirichlet(1,..,1) IS normalized exponentials — so no gamma rejection
        # samplers (XLA while_loops). Measured wall-clock NEUTRAL on TPU
        # (interleaved A/B ties at both view and train-step level, BENCH.md
        # Training round 3): kept for the simpler HLO and exact sampling,
        # not for speed.
        e = -jnp.log(
            jax.random.uniform(
                k_dir, (b, width), jnp.float32, jnp.finfo(jnp.float32).tiny, 1.0
            )
        )
        ws = e / jnp.sum(e, axis=-1, keepdims=True)  # [B, width]
        blend = jax.random.uniform(k_beta, (b,), jnp.float32)[:, None, None, None]
    else:
        ws = jax.random.dirichlet(
            k_dir, jnp.full((width,), alpha, jnp.float32), (b,), jnp.float32
        )  # [B, width]
        blend = jax.random.beta(k_beta, alpha, alpha, (b,), jnp.float32)[
            :, None, None, None
        ]

    gate_p = ((1.0 + max_depth) / 2.0) / (
        NUM_OPS + (1 if freq else 0) + (1 if occlude else 0) + (1 if bars else 0)
    )
    # all chains in one program: [width*B, H, W, C]
    chain_dtype = jnp.bfloat16 if bf16 else jnp.float32
    rep = jnp.tile(images.astype(chain_dtype), (width, 1, 1, 1))
    chained = _chain(k_chains, rep, gate_p, freq, occlude, bars).reshape(
        (width, b) + images.shape[1:]
    )
    # the [B]-sized mixing tail runs f32 either way (negligible traffic)
    mix = jnp.einsum(
        "bw,wbhxc->bhxc", ws, chained.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out = jnp.clip(blend * images + (1.0 - blend) * mix, 0.0, 1.0)
    return jax.lax.convert_element_type(out, orig_dtype)


def js_consistency(logits_clean: jax.Array, logits_a: jax.Array, logits_b: jax.Array) -> jax.Array:
    """Jensen-Shannon divergence across the three predictive distributions
    (the AugMix consistency loss, Hendrycks et al. eq. 2)."""
    p0 = jax.nn.softmax(logits_clean, axis=-1)
    p1 = jax.nn.softmax(logits_a, axis=-1)
    p2 = jax.nn.softmax(logits_b, axis=-1)
    m = jnp.clip((p0 + p1 + p2) / 3.0, 1e-7, 1.0)
    logm = jnp.log(m)

    def kl(p):
        logp = jnp.log(jnp.clip(p, 1e-7, 1.0))
        return jnp.sum(p * (logp - logm), axis=-1)

    return jnp.mean((kl(p0) + kl(p1) + kl(p2)) / 3.0)
