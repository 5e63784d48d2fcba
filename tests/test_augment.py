"""AugMix augmentation ops and the consistency train step.

The reference trains nothing (reference platform/backend/anomaly_simulator.py:7-9);
AugMix-style robust training is a framework capability on top of the same
corruption-grid protocol (SURVEY.md §5.3). Ops must stay disjoint from the 15
test corruptions — these tests pin the op semantics and the training contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.ops.augment import NUM_OPS, augment_op, augmix, js_consistency


@pytest.fixture(scope="module")
def imgs():
    return jax.random.uniform(jax.random.PRNGKey(3), (4, 16, 16, 3))


def test_augmix_shape_range_determinism(imgs):
    key = jax.random.PRNGKey(0)
    out = augmix(key, imgs)
    assert out.shape == imgs.shape and out.dtype == imgs.dtype
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert np.allclose(out, augmix(key, imgs))  # same key -> same batch
    assert not np.allclose(out, augmix(jax.random.PRNGKey(1), imgs))
    # per-image independence: images in a batch get different chains
    same = jnp.stack([imgs[0], imgs[0]])
    pair = augmix(key, same)
    assert not np.allclose(pair[0], pair[1])


def test_all_ops_finite_and_shaped(imgs):
    img = imgs[0]
    for i in range(NUM_OPS):
        out = augment_op(jnp.int32(i), img, jnp.float32(0.8), jax.random.PRNGKey(i))
        assert out.shape == img.shape
        assert bool(jnp.isfinite(out).all()), f"op {i} produced non-finite values"


def test_posterize_quantizes():
    img = jnp.linspace(0.0, 1.0, 256).reshape(16, 16, 1)
    out = augment_op(jnp.int32(5), img, jnp.float32(1.0), jax.random.PRNGKey(0))
    # mag 1.0 -> 4 levels
    assert len(np.unique(np.asarray(out).round(6))) <= 4


def test_solarize_inverts_above_threshold():
    img = jnp.full((4, 4, 1), 0.9)
    out = augment_op(jnp.int32(6), img, jnp.float32(1.0), jax.random.PRNGKey(0))
    assert np.allclose(out, 1.0 - img)  # 0.9 >= thresh 0.3 -> inverted
    low = jnp.full((4, 4, 1), 0.1)
    out_low = augment_op(jnp.int32(6), low, jnp.float32(1.0), jax.random.PRNGKey(0))
    assert np.allclose(out_low, low)  # below threshold untouched


def test_autocontrast_stretches_to_full_range():
    img = jnp.linspace(0.3, 0.6, 64).reshape(8, 8, 1)
    out = augment_op(jnp.int32(7), img, jnp.float32(1.0), jax.random.PRNGKey(0))
    assert abs(float(out.min())) < 1e-5 and abs(float(out.max()) - 1.0) < 1e-5


def test_translate_moves_content():
    img = jnp.zeros((16, 16, 1)).at[8, 8, 0].set(1.0)
    out = augment_op(jnp.int32(3), img, jnp.float32(1.0), jax.random.PRNGKey(0))
    peak = np.unravel_index(np.argmax(np.asarray(out)), out.shape)
    assert peak[1] != 8  # translate_x moved the bright pixel horizontally


def test_ops_disjoint_from_test_corruptions():
    """The leak-free contract: no augmentation op name overlaps the 15-cell grid."""
    from fav_tpu.ops.augment import _OPS
    from fav_tpu.ops.corruptions import CORRUPTION_NAMES

    op_names = {f.__name__.lstrip("_") for f in _OPS} | {
        "freq_band",
        "occlude",
        "occlude_bars",
    }
    assert not op_names & set(CORRUPTION_NAMES)


@pytest.mark.slow
def test_freq_band_identity_at_zero_and_spectral_at_one():
    """The spectral band-gain op (weather-axis coverage): identity at mag 0,
    preserves the image mean (DC gain pinned to 1), and actually moves the
    low-frequency energy fraction at mag 1 — the axis fog exploits
    (tools/diagnose_weather.py: clean 0.07 -> fog 0.78-0.87)."""
    import numpy as np

    from fav_tpu.ops.augment import _freq_band

    key = jax.random.PRNGKey(3)
    x = jnp.clip(jax.random.uniform(jax.random.PRNGKey(1), (6, 32, 32, 3)), 0, 1)
    ident = _freq_band(x, jnp.zeros((6,)), key)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(x), atol=1e-5)

    out = _freq_band(x, jnp.ones((6,)), key)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert float(jnp.mean(jnp.abs(out - x))) > 1e-3
    # mean brightness preserved up to the [0,1] clip (DC untouched)
    assert float(jnp.max(jnp.abs(out.mean(axis=(1, 2, 3)) - x.mean(axis=(1, 2, 3))))) < 0.05

    def lofrac(img):
        gray = jnp.mean(img, axis=-1)
        f = jnp.abs(jnp.fft.fft2(gray)) ** 2
        h, w = gray.shape[-2:]
        fy = jnp.minimum(jnp.arange(h), h - jnp.arange(h))[:, None]
        fx = jnp.minimum(jnp.arange(w), w - jnp.arange(w))[None, :]
        r = jnp.sqrt(fy**2 + fx**2)
        lo = jnp.sum(jnp.where((r > 0) & (r <= 4), f, 0.0), axis=(-2, -1))
        tot = jnp.sum(jnp.where(r > 0, f, 0.0), axis=(-2, -1))
        return lo / tot

    # across many draws, the op must sometimes push the lofreq fraction well
    # above the clean level (fog-direction coverage)
    fracs = []
    for i in range(8):
        out_i = _freq_band(x, jnp.ones((6,)), jax.random.PRNGKey(100 + i))
        fracs.append(np.asarray(lofrac(out_i)))
    clean = np.asarray(lofrac(x))
    assert np.max(np.stack(fracs) - clean[None]) > 0.15


def test_augmix_freq_variant_differs_and_is_deterministic():
    import numpy as np

    x = jnp.clip(jax.random.uniform(jax.random.PRNGKey(5), (4, 32, 32, 3)), 0, 1)
    key = jax.random.PRNGKey(9)
    base = augmix(key, x)
    fr1 = augmix(key, x, freq=True)
    fr2 = augmix(key, x, freq=True)
    np.testing.assert_allclose(np.asarray(fr1), np.asarray(fr2), atol=0)
    assert float(jnp.mean(jnp.abs(fr1 - base))) > 1e-4  # different op pool
    assert fr1.shape == x.shape
    assert float(fr1.min()) >= 0.0 and float(fr1.max()) <= 1.0


def test_occlude_identity_at_zero_and_blanks_at_one():
    """The rectangular occlusion op (snow-axis coverage): bitwise identity
    at mag 0 (strict-< masks), and at mag 1 it blanks a contiguous
    axis-aligned region with a constant fill — information removal, the
    failure mechanism snow exploits that no base op trains."""
    import numpy as np

    from fav_tpu.ops.augment import _occlude

    key = jax.random.PRNGKey(3)
    x = jnp.clip(jax.random.uniform(jax.random.PRNGKey(1), (6, 32, 32, 3)), 0, 1)
    ident = _occlude(x, jnp.zeros((6,)), key)
    np.testing.assert_array_equal(np.asarray(ident), np.asarray(x))

    out = _occlude(x, jnp.ones((6,)), key)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    changed = np.asarray(jnp.any(out != x, axis=-1))  # [B, H, W]
    frac = changed.mean(axis=(1, 2))
    assert frac.max() > 0.02  # some image lost a real region
    assert frac.max() < 0.75  # never wipes out the whole image
    # occluded pixels are constant per rectangle: within one image the
    # changed region takes at most 2 distinct fill values per channel
    b = int(np.argmax(frac))
    vals = np.unique(np.round(np.asarray(out[b])[changed[b]], 5))
    assert len(vals) <= 6  # 2 rects x 3 channels


@pytest.mark.slow
def test_occlude_bars_identity_at_zero_and_oriented_at_one():
    """The oriented-bar occlusion op (snow-axis streak geometry): bitwise
    identity at mag 0 (strict-< masks); at mag 1 it blanks thin rotated
    bars — constant fills, elongated shape, and across draws the occluded
    shapes must actually be oblique (not all axis-aligned)."""
    import numpy as np

    from fav_tpu.ops.augment import _occlude_bars

    x = jnp.clip(jax.random.uniform(jax.random.PRNGKey(1), (6, 32, 32, 3)), 0, 1)
    ident = _occlude_bars(x, jnp.zeros((6,)), jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(ident), np.asarray(x))

    out = _occlude_bars(x, jnp.ones((6,)), jax.random.PRNGKey(3))
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    changed = np.asarray(jnp.any(out != x, axis=-1))  # [B, H, W]
    frac = changed.mean(axis=(1, 2))
    assert frac.max() > 0.01  # some image lost a real region
    assert frac.max() < 0.6  # thin bars never wipe out the image
    # constant fill: the changed region takes few distinct values
    b = int(np.argmax(frac))
    vals = np.unique(np.round(np.asarray(out[b])[changed[b]], 5))
    assert len(vals) <= 9  # 3 bars x 3 channels
    # orientation: across many draws, some bar's bounding box must be
    # substantially larger than its area (an oblique bar fills ~w/d of
    # its bbox; an axis-aligned rectangle fills ~100%)
    oblique = False
    for i in range(10):
        o = _occlude_bars(x[:1], jnp.ones((1,)), jax.random.PRNGKey(50 + i))
        ch = np.asarray(jnp.any(o != x[:1], axis=-1))[0]
        if ch.sum() < 20:
            continue
        rows = np.where(ch.any(axis=1))[0]
        cols = np.where(ch.any(axis=0))[0]
        bbox = (rows.max() - rows.min() + 1) * (cols.max() - cols.min() + 1)
        if ch.sum() < 0.55 * bbox:
            oblique = True
            break
    assert oblique, "no draw produced an oblique bar"


def test_augmix_bars_variant_differs_and_is_deterministic():
    import numpy as np

    x = jnp.clip(jax.random.uniform(jax.random.PRNGKey(5), (4, 32, 32, 3)), 0, 1)
    key = jax.random.PRNGKey(9)
    base = augmix(key, x)
    b1 = augmix(key, x, bars=True)
    b2 = augmix(key, x, bars=True)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=0)
    assert float(jnp.mean(jnp.abs(b1 - base))) > 1e-4  # different op pool
    assert float(b1.min()) >= 0.0 and float(b1.max()) <= 1.0
    # the base pool's draws are bitwise unchanged when the flag is off
    np.testing.assert_array_equal(np.asarray(base), np.asarray(augmix(key, x)))


def test_augmix_bf16_close_to_f32_and_deterministic():
    """The bf16 chain (augmix(..., bf16=True)) must track the f32 path: same
    key schedule (randomness is still drawn f32), f32 output dtype, and the
    deviation bounded by compounding bf16 rounding — mean |diff| well under
    1e-2 with isolated pixels allowed a posterize-bucket flip (the one op
    whose rounding boundary can move a full quantum)."""
    x = jnp.clip(jax.random.uniform(jax.random.PRNGKey(11), (8, 32, 32, 3)), 0, 1)
    key = jax.random.PRNGKey(4)
    f32 = augmix(key, x)
    b16 = augmix(key, x, bf16=True)
    assert b16.dtype == x.dtype and b16.shape == x.shape
    assert float(b16.min()) >= 0.0 and float(b16.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(b16), np.asarray(augmix(key, x, bf16=True)))
    diff = np.abs(np.asarray(f32) - np.asarray(b16))
    assert diff.mean() < 0.01, f"mean bf16 deviation {diff.mean():.4f}"
    assert np.quantile(diff, 0.99) < 0.05, f"p99 {np.quantile(diff, 0.99):.4f}"
    # and the flag must change nothing about the f32 path's draws
    np.testing.assert_array_equal(np.asarray(f32), np.asarray(augmix(key, x)))


def test_shift_rows_bf16_barrel_matches_windows_oracle():
    """The barrel-shift and window-select forms share their arithmetic, so
    they must stay bitwise identical in bf16 exactly as they do in f32."""
    from fav_tpu.ops.augment import _shift_rows, _shift_rows_windows

    x = jax.random.uniform(
        jax.random.PRNGKey(2), (3, 16, 16, 3), jnp.float32
    ).astype(jnp.bfloat16)
    delta = jax.random.uniform(jax.random.PRNGKey(5), (3, 16), jnp.float32, -5.0, 5.0)
    a = _shift_rows(x, delta, 6)
    b = _shift_rows_windows(x, delta, 6)
    assert a.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)
    )


def test_augmix_occlude_variant_differs_and_is_deterministic():
    import numpy as np

    x = jnp.clip(jax.random.uniform(jax.random.PRNGKey(5), (4, 32, 32, 3)), 0, 1)
    key = jax.random.PRNGKey(9)
    base = augmix(key, x)
    oc1 = augmix(key, x, occlude=True)
    oc2 = augmix(key, x, occlude=True)
    np.testing.assert_allclose(np.asarray(oc1), np.asarray(oc2), atol=0)
    assert float(jnp.mean(jnp.abs(oc1 - base))) > 1e-4  # different op pool
    assert float(oc1.min()) >= 0.0 and float(oc1.max()) <= 1.0
    # the base pool's draws are bitwise unchanged when the flag is off
    np.testing.assert_array_equal(np.asarray(base), np.asarray(augmix(key, x)))


def test_augmix_closed_form_mix_weights_distribution():
    """alpha=1 mixing uses closed forms (Beta(1,1)=U(0,1), Dirichlet(1^w)=
    normalized exponentials) instead of gamma rejection samplers. Sanity:
    the blended output stays a convex combination, and across many images
    the per-chain Dirichlet marginals have mean 1/width (exchangeability) —
    a wrong normalization or a biased sampler would break both."""
    import numpy as np

    # reach inside augmix's sampling via the same key schedule
    b, width = 4096, 3
    key = jax.random.PRNGKey(0)
    k_dir, k_beta, _ = jax.random.split(key, 3)
    e = -jnp.log(
        jax.random.uniform(
            k_dir, (b, width), jnp.float32, jnp.finfo(jnp.float32).tiny, 1.0
        )
    )
    ws = e / jnp.sum(e, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(ws.sum(-1)), 1.0, atol=1e-5)
    assert float(ws.min()) >= 0.0
    np.testing.assert_allclose(np.asarray(ws.mean(0)), 1.0 / width, atol=0.02)
    # Dirichlet(1,1,1) marginals are Beta(1, 2): var = 2/36
    np.testing.assert_allclose(np.asarray(ws.var(0)), 2.0 / 36.0, atol=0.01)
    blend = jax.random.uniform(k_beta, (b,), jnp.float32)
    assert abs(float(blend.mean()) - 0.5) < 0.03  # Beta(1,1) = U(0,1)
    assert abs(float(blend.var()) - 1.0 / 12.0) < 0.01


def test_js_consistency_properties():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (8, 10))
    assert abs(float(js_consistency(logits, logits, logits))) < 1e-6
    div = float(js_consistency(logits, -logits, 2.0 * logits))
    assert 0.0 < div < np.log(3.0) + 1e-6  # JS of 3 dists is bounded by ln 3


@pytest.mark.slow
def test_augmix_train_step_learns():
    import optax

    from fav_tpu.config import ModelParams
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.train import augmix_train_step, create_train_state

    model = create_model(ModelParams(widths=(8, 16), dense_width=16))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (16, 32, 32, 3))
    y = jax.random.randint(key, (16,), 0, 10)
    params = model.init(key, x[:1])
    state, tx = create_train_state(params)
    lam = jnp.float32(12.0)
    first = None
    for i in range(12):
        state, m = augmix_train_step(
            model.apply, tx, state, x, y, jax.random.fold_in(key, i), lam
        )
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first  # memorizes the fixed batch
    assert float(m["js"]) >= 0.0
    assert int(state.step) == 12


@pytest.mark.slow
def test_ensemble_augmix_train_step():
    import optax

    from fav_tpu.config import ModelParams
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.train import TrainState, make_ensemble_train_step
    from fav_tpu.models.uncertainty import init_ensemble

    model = create_model(ModelParams(widths=(8, 16), dense_width=16))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (8, 32, 32, 3))
    y = jax.random.randint(key, (8,), 0, 10)
    stacked = init_ensemble(model, key, x[:1], 3)
    tx = optax.adamw(1e-3)
    states = TrainState(stacked, jax.vmap(tx.init)(stacked), jnp.zeros((3,), jnp.int32))
    step = make_ensemble_train_step(model.apply, tx, augmix=True)
    states, m = step(states, x, y, key)
    assert m["loss"].shape == (3,)
    assert bool(jnp.isfinite(m["loss"]).all())
    # member-independent augmentation draws -> member losses differ
    assert len({round(float(v), 6) for v in m["loss"]}) > 1
    assert int(states.step[0]) == 1


@pytest.mark.slow
def test_sam_augmix_train_step():
    import optax

    from fav_tpu.config import ModelParams
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.train import create_train_state, sam_augmix_train_step

    model = create_model(ModelParams(widths=(8, 16), dense_width=16))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (8, 32, 32, 3))
    y = jax.random.randint(key, (8,), 0, 10)
    params = model.init(key, x[:1])
    state, tx = create_train_state(params)
    lam, rho = jnp.float32(12.0), jnp.float32(0.05)
    first = None
    for i in range(8):
        state, m = sam_augmix_train_step(
            model.apply, tx, state, x, y, jax.random.fold_in(key, i), lam, rho
        )
        if first is None:
            first = float(m["loss"])
    assert bool(jnp.isfinite(m["loss"]))
    assert float(m["loss"]) < first
    assert int(state.step) == 8


@pytest.mark.slow
def test_ensemble_augmix_ce_mode():
    import optax

    from fav_tpu.config import ModelParams
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.train import TrainState, make_ensemble_train_step
    from fav_tpu.models.uncertainty import init_ensemble

    model = create_model(ModelParams(widths=(8, 16), dense_width=16))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (8, 32, 32, 3))
    y = jax.random.randint(key, (8,), 0, 10)
    stacked = init_ensemble(model, key, x[:1], 2)
    tx = optax.adamw(1e-3)
    states = TrainState(stacked, jax.vmap(tx.init)(stacked), jnp.zeros((2,), jnp.int32))
    step = make_ensemble_train_step(model.apply, tx, augmix=True, augmix_mode="ce")
    states, m = step(states, x, y, key)
    assert m["loss"].shape == (2,) and bool(jnp.isfinite(m["loss"]).all())
    assert len({round(float(v), 6) for v in m["loss"]}) > 1  # member-independent draws


@pytest.mark.slow
def test_affine_scanline_pallas_matches_xla():
    """The VMEM shear kernels are the same arithmetic as the XLA
    select-accumulate: tent weights are exactly (1-frac, frac) at the two
    interpolation offsets and exactly 0.0 elsewhere, so the sums agree to
    fp rounding. Pinned in interpret mode on random knobs incl. identity."""
    import numpy as np

    from fav_tpu.ops.augment import (
        _MAX_ROT,
        _MAX_SHEAR,
        _MAX_TRANSLATE,
        _affine_scanline,
    )
    from fav_tpu.ops.augment_pallas import affine_scanline_pallas

    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 6)
    b = 6
    x = jax.random.uniform(ks[0], (b, 32, 32, 3), jnp.float32)
    theta = jax.random.uniform(ks[1], (b,), jnp.float32, -1, 1) * _MAX_ROT
    sx = jax.random.uniform(ks[2], (b,), jnp.float32, -1, 1) * _MAX_SHEAR
    sy = jax.random.uniform(ks[3], (b,), jnp.float32, -1, 1) * _MAX_SHEAR
    tx = jax.random.uniform(ks[4], (b,), jnp.float32, -1, 1) * _MAX_TRANSLATE * 32
    ty = jax.random.uniform(ks[5], (b,), jnp.float32, -1, 1) * _MAX_TRANSLATE * 32
    # exercise the exact-identity row too
    theta = theta.at[0].set(0.0)
    sx = sx.at[0].set(0.0)
    sy = sy.at[0].set(0.0)
    tx = tx.at[0].set(0.0)
    ty = ty.at[0].set(0.0)

    want = _affine_scanline(x, theta, sx, sy, tx, ty)
    got = affine_scanline_pallas(x, theta, sx, sy, tx, ty, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(x[0]), atol=1e-6)


def test_augmix_pallas_dispatch_env_override(monkeypatch):
    """FAV_AUGMIX_PALLAS=1 opts into the Pallas affine; the default is the
    XLA path on every backend (the kernels measured negative, BENCH.md)."""
    from fav_tpu.ops import augment

    monkeypatch.delenv("FAV_AUGMIX_PALLAS", raising=False)
    assert augment._use_pallas_affine() is False
    monkeypatch.setenv("FAV_AUGMIX_PALLAS", "1")
    assert augment._use_pallas_affine() is True
    monkeypatch.setenv("FAV_AUGMIX_PALLAS", "0")
    assert augment._use_pallas_affine() is False


@pytest.mark.slow
def test_shift_rows_barrel_matches_windows_bitwise():
    """The barrel-shift form of _shift_rows must be BITWISE identical to the
    original window select-accumulate: same clip/floor/frac math, same padded
    source values, same final interpolation expression — only the routing of
    values through selects differs. Covers boundary offsets (-m, m-1+eps),
    exact-integer shifts, zero, and mixed random deltas at several m."""
    import numpy as np

    from fav_tpu.ops.augment import _shift_rows, _shift_rows_windows

    key = jax.random.PRNGKey(7)
    for m, (b, h, w) in [(18, (3, 32, 32)), (5, (2, 8, 16)), (1, (2, 4, 4))]:
        kx, kd = jax.random.split(jax.random.fold_in(key, m))
        x = jax.random.uniform(kx, (b, h, w, 3), jnp.float32)
        delta = jax.random.uniform(kd, (b, h), jnp.float32, -m - 2.0, m + 2.0)
        # force the edge cases onto specific rows
        delta = delta.at[0, 0].set(-float(m))
        delta = delta.at[0, 1].set(m - 1 + 0.999)
        delta = delta.at[0, 2 % h].set(0.0)
        delta = delta.at[1, 0].set(3.0 % m)  # exact integer shift
        got = _shift_rows(x, delta, m)
        want = _shift_rows_windows(x, delta, m)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_shift_cols_matches_windows_oracle_nonsquare():
    """_shift_cols (transpose + barrel rows + transpose) vs the windows
    oracle through the same transposes, on non-square images (catches any
    axis mix-up). A direct axis-1 barrel variant measured slower on TPU
    and was not kept (tools/ab_shift_rows.py)."""
    import numpy as np

    from fav_tpu.ops.augment import _shift_cols, _shift_rows_windows

    key = jax.random.PRNGKey(11)
    for m, (b, h, w) in [(7, (3, 16, 24)), (3, (2, 8, 4))]:
        kx, kd = jax.random.split(jax.random.fold_in(key, m))
        x = jax.random.uniform(kx, (b, h, w, 3), jnp.float32)
        delta = jax.random.uniform(kd, (b, w), jnp.float32, -m - 1.0, m + 1.0)
        got = _shift_cols(x, delta, m)
        want = _shift_rows_windows(
            x.transpose(0, 2, 1, 3), delta, m
        ).transpose(0, 2, 1, 3)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
