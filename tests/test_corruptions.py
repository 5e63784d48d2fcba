"""Corruption-suite tests: shape/range, determinism, severity monotonicity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.ops.corruptions import CORRUPTION_NAMES, apply_corruption

KEY = jax.random.PRNGKey(0)


def make_batch(b=4, h=32, w=32):
    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.5 + 0.3 * np.sin(xx / 5.0)[..., None] * np.cos(yy / 7.0)[..., None]
    imgs = np.broadcast_to(base, (b, h, w, 1)) + 0.2 * rng.random((b, h, w, 3))
    return jnp.asarray(np.clip(imgs, 0, 1), jnp.float32)


BATCH = make_batch()


def test_all_fifteen_present():
    assert len(CORRUPTION_NAMES) == 15
    expected = {
        "gaussian_noise", "shot_noise", "impulse_noise",
        "defocus_blur", "glass_blur", "motion_blur", "zoom_blur",
        "snow", "frost", "fog",
        "brightness", "contrast", "elastic_transform", "pixelate", "jpeg_compression",
    }
    assert set(CORRUPTION_NAMES) == expected


@pytest.mark.parametrize("name", CORRUPTION_NAMES)
@pytest.mark.parametrize("severity", [1, 3, 5])
def test_shape_dtype_range(name, severity):
    out = apply_corruption(name, KEY, BATCH, severity)
    assert out.shape == BATCH.shape
    assert out.dtype == BATCH.dtype
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert o.min() >= 0.0 and o.max() <= 1.0


@pytest.mark.parametrize("name", CORRUPTION_NAMES)
def test_deterministic_given_key(name):
    a = np.asarray(apply_corruption(name, KEY, BATCH, 3))
    b = np.asarray(apply_corruption(name, KEY, BATCH, 3))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name", CORRUPTION_NAMES)
def test_severity_monotone_distortion(name):
    """Mean distortion (L2 from clean) should not decrease with severity."""
    dists = []
    for severity in (1, 3, 5):
        out = np.asarray(apply_corruption(name, KEY, BATCH, severity))
        dists.append(float(np.sqrt(np.mean((out - np.asarray(BATCH)) ** 2))))
    assert dists[0] > 0.0, "severity 1 must actually distort"
    assert dists[2] >= dists[0] * 1.05, f"severity 5 not stronger than 1: {dists}"


@pytest.mark.parametrize("name", ["gaussian_noise", "impulse_noise", "elastic_transform", "glass_blur"])
def test_different_keys_differ(name):
    a = np.asarray(apply_corruption(name, jax.random.PRNGKey(1), BATCH, 3))
    b = np.asarray(apply_corruption(name, jax.random.PRNGKey(2), BATCH, 3))
    assert not np.array_equal(a, b)


@pytest.mark.parametrize("severity", [1, 3, 5])
def test_elastic_shift_window_equals_gather(severity):
    """The gather-free tent-filter warp must equal the bilinear-gather oracle
    (same displacement fields, same clamping) to float tolerance."""
    from fav_tpu.ops.corruptions import _elastic_transform_gather, elastic_transform

    key = jax.random.PRNGKey(7)
    want = np.asarray(_elastic_transform_gather(key, BATCH, severity))
    got = np.asarray(elastic_transform(key, BATCH, severity))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_jpeg_blocking_artifact_structure():
    """JPEG round-trip must preserve rough content but quantize detail."""
    out = np.asarray(apply_corruption("jpeg_compression", KEY, BATCH, 5))
    clean = np.asarray(BATCH)
    assert abs(out.mean() - clean.mean()) < 0.05  # DC preserved
    assert np.sqrt(np.mean((out - clean) ** 2)) > 0.01  # detail lost


def test_contrast_reduces_variance():
    out = np.asarray(apply_corruption("contrast", KEY, BATCH, 5))
    assert out.std() < np.asarray(BATCH).std() * 0.3


def test_brightness_shifts_mean():
    out = np.asarray(apply_corruption("brightness", KEY, BATCH, 3))
    assert out.mean() > np.asarray(BATCH).mean() + 0.1


def test_pixelate_reduces_unique_blocks():
    out = np.asarray(apply_corruption("pixelate", KEY, BATCH, 5))
    # nearest-upsampled image has large constant runs
    diffs = np.abs(np.diff(out, axis=2))
    assert (diffs == 0).mean() > 0.5


# ── MXU banded-matmul blur variants (corruptions_pallas) vs the oracles ─────
# The megastep is corruption-bound (BENCH.md "Corruption-share profile");
# the conv blurs route to rank-stacked banded matmuls in the fast path.
# Same key -> same selected kernel, so equivalence is exact up to float
# reassociation.

# per-commit gate keeps one severity per corruption (3, mid-table); the full
# 5-severity equivalence sweep runs in the slow tier (~40 s of compiles on
# the 1-core CPU box — measured via --durations, VERDICT r4 weak #1)
@pytest.mark.parametrize(
    "severity",
    [pytest.param(s, marks=() if s == 3 else pytest.mark.slow) for s in [1, 2, 3, 4, 5]],
)
@pytest.mark.parametrize(
    "name", ["defocus_blur", "motion_blur", "zoom_blur", "snow", "fog", "frost"]
)
def test_matmul_blur_matches_oracle(name, severity):
    from fav_tpu.ops import corruptions
    from fav_tpu.ops import corruptions_pallas as cp

    oracle = getattr(corruptions, name)
    fast = getattr(cp, f"{name}_matmul")
    key = jax.random.PRNGKey(severity * 7 + 1)
    a = np.asarray(oracle(key, BATCH, severity))
    b = np.asarray(fast(key, BATCH, severity))
    assert np.max(np.abs(a - b)) < 3e-6


def test_fast_corruption_fn_routes_matmul_blurs():
    from fav_tpu.ops.corruptions_pallas import (
        defocus_blur_matmul,
        fast_corruption_fn,
        motion_blur_matmul,
        zoom_blur_matmul,
    )

    assert fast_corruption_fn("defocus_blur") is defocus_blur_matmul
    assert fast_corruption_fn("motion_blur") is motion_blur_matmul
    assert fast_corruption_fn("zoom_blur") is zoom_blur_matmul


def test_svd_band_factors_rank_truncation():
    from fav_tpu.ops.image import depthwise_conv2d, svd_band_factors
    from fav_tpu.ops.corruptions import _disk

    disk = np.asarray(_disk(6, 0.5))
    my, mx = svd_band_factors(disk, 32, 32)
    # the disk PSF is numerically low-rank: far fewer factors than its size
    assert my.shape[0] == mx.shape[0] < disk.shape[0]
    # and the truncated expansion still reproduces the depthwise conv
    from fav_tpu.ops.image import depthwise_conv2d_matmul
    ref = depthwise_conv2d(BATCH, jnp.asarray(disk))
    out = depthwise_conv2d_matmul(BATCH, disk)
    assert float(jnp.max(jnp.abs(ref - out))) < 3e-6
