"""Feature-space failure scores (fav_tpu/models/mahalanobis.py) and the
sweep extra-score contract (fav_tpu/parallel/sweep.py:_split_output).

The reference defines failure as an incorrect prediction with HIGH
confidence (reference README.md:22-24) — the one case logit-space signals
are structurally blind to. Mahalanobis / relative-Mahalanobis distance on
penultimate features (Lee et al. 2018; Ren et al. 2021) scores the input's
departure from the training manifold directly, label-free."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.config import ModelParams
from fav_tpu.models.cnn import create_model
from fav_tpu.models.mahalanobis import (
    collect_features,
    features_and_logits,
    fit_feature_gaussians,
    mahalanobis_scores,
)
from fav_tpu.parallel.sweep import corruption_sweep, fused_sweep

SMALL = ModelParams(widths=(8, 16), dense_width=16)


@pytest.fixture(scope="module")
def tiny_model():
    model = create_model(SMALL)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


@pytest.mark.slow
def test_sow_is_noop_for_plain_apply(tiny_model):
    """The sow hook must not change logits, params, or the plain-apply
    return shape — serving/sweeps/training paths are bitwise unchanged."""
    model, variables = tiny_model
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    plain = model.apply(variables, x)
    feats, logits = features_and_logits(model, variables, x)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(logits))
    assert plain.shape == (4, 10)
    assert feats.shape == (4, SMALL.dense_width)
    assert feats.dtype == jnp.float32
    # init() denies 'intermediates': checkpoints see only params
    assert set(variables.keys()) == {"params"}


@pytest.mark.slow
def test_sow_features_all_archs():
    """Every model family sows a [B, D] penultimate-feature row."""
    for mp, d in (
        (SMALL, SMALL.dense_width),
        (ModelParams(arch="resnet", widths=(8, 16)), 16),
        (ModelParams(arch="vit", vit_dim=32, vit_depth=1, vit_heads=4), 32),
    ):
        model = create_model(mp)
        x = jnp.zeros((3, 32, 32, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        feats, logits = features_and_logits(model, variables, x)
        assert feats.shape == (3, d), mp.arch
        assert logits.shape == (3, 10), mp.arch


def test_fit_and_score_match_numpy_oracle():
    """Module scores == direct float64 NumPy Mahalanobis with explicit
    inverse of the shrunk covariance."""
    rng = np.random.default_rng(0)
    n, d, c = 400, 12, 4
    feats = rng.normal(size=(n, d))
    labels = rng.integers(0, c, size=n)
    fit = fit_feature_gaussians(feats, labels, c, shrinkage=1e-2)

    means = np.stack([feats[labels == k].mean(0) for k in range(c)])
    centered = feats - means[labels]
    cov = centered.T @ centered / n
    cov += 1e-2 * (np.trace(cov) / d) * np.eye(d)
    prec = np.linalg.inv(cov)
    bg_mu = feats.mean(0)
    bg_cov = (feats - bg_mu).T @ (feats - bg_mu) / n
    bg_cov += 1e-2 * (np.trace(bg_cov) / d) * np.eye(d)
    bg_prec = np.linalg.inv(bg_cov)

    q = rng.normal(size=(32, d))
    got = {k: np.asarray(v) for k, v in mahalanobis_scores(jnp.asarray(q, jnp.float32), fit).items()}
    diff = q[:, None, :] - means[None]
    md = np.einsum("bcd,de,bce->bc", diff, prec, diff).min(-1)
    md_bg = np.einsum("bd,de,be->b", q - bg_mu, bg_prec, q - bg_mu)
    np.testing.assert_allclose(got["maha"], md, rtol=2e-3)
    np.testing.assert_allclose(got["rmd"], md - md_bg, rtol=5e-3, atol=1e-3)


def test_scores_separate_in_from_out_of_distribution():
    """In-distribution features score low; a shifted cluster scores high —
    AUROC ~1 for both maha and rmd."""
    rng = np.random.default_rng(1)
    d, c = 8, 3
    centers = rng.normal(size=(c, d)) * 3.0
    labels = rng.integers(0, c, size=600)
    feats = centers[labels] + rng.normal(size=(600, d)) * 0.5
    fit = fit_feature_gaussians(feats, labels, c)

    in_q = centers[labels[:100]] + rng.normal(size=(100, d)) * 0.5
    out_q = rng.normal(size=(100, d)) * 0.5 + 10.0
    s_in = mahalanobis_scores(jnp.asarray(in_q, jnp.float32), fit)
    s_out = mahalanobis_scores(jnp.asarray(out_q, jnp.float32), fit)
    for k in ("maha", "rmd"):
        assert float(np.median(np.asarray(s_out[k]))) > float(
            np.max(np.asarray(s_in[k]))
        ), k


def test_collect_features_pads_tail_chunk(tiny_model):
    model, variables = tiny_model
    images = jax.random.uniform(jax.random.PRNGKey(2), (10, 32, 32, 3))
    feats = collect_features(model, variables, images, batch_size=4)
    assert feats.shape == (10, SMALL.dense_width)
    direct, _ = features_and_logits(model, variables, images[8:10])
    # bf16 compute: XLA tiling differs across batch shapes — bf16-resolution
    # agreement is the contract (padding rows must not leak, shape exact)
    np.testing.assert_allclose(feats[8:10], np.asarray(direct), atol=2e-2)


def test_sweep_extra_scores_fused_vs_per_cell(tiny_model):
    """The extra-score contract: (logits, {name: row}) scorers produce
    auroc_<name>/mean_<name> per cell, identical across the fused and
    per-cell paths (same fold_in key schedule)."""
    model, variables = tiny_model
    images = jax.random.uniform(jax.random.PRNGKey(3), (32, 32, 32, 3))
    labels = jnp.arange(32) % 10
    feats0 = collect_features(model, variables, images)
    fit = fit_feature_gaussians(feats0, np.asarray(labels), 10)

    def apply_fn(p, x):
        feats, logits = features_and_logits(model, p, x)
        return logits, mahalanobis_scores(feats, fit)

    kwargs = dict(corruptions=("gaussian_noise",), severities=(1, 3), temperature=1.0)
    key = jax.random.PRNGKey(9)
    fused = fused_sweep(apply_fn, variables, images, labels, key, **kwargs)
    percell = corruption_sweep(apply_fn, variables, images, labels, key, **kwargs)
    for sev in (1, 3):
        f, p = fused["gaussian_noise"][sev], percell["gaussian_noise"][sev]
        for m in ("auroc_maha", "auroc_rmd", "mean_maha", "mean_rmd"):
            assert m in f and m in p
            np.testing.assert_allclose(f[m], p[m], rtol=1e-4, atol=1e-4)
        # the plain metrics are untouched by the extra rows
        np.testing.assert_allclose(f["accuracy"], p["accuracy"], atol=1e-6)


def test_sweep_without_extra_has_no_extra_keys(tiny_model):
    model, variables = tiny_model
    images = jax.random.uniform(jax.random.PRNGKey(4), (16, 32, 32, 3))
    labels = jnp.arange(16) % 10
    out = fused_sweep(model.apply, variables, images, labels, jax.random.PRNGKey(0),
                      corruptions=("brightness",), severities=(1,))
    assert not any(k.startswith(("auroc_maha", "mean_maha")) for k in out["brightness"][1])


@pytest.mark.slow
def test_evaluate_maha_cli(tmp_path):
    """End-to-end: evaluate --maha reports feature-space AUROC per family."""
    from fav_tpu.models.evaluate import main as eval_main

    out = tmp_path / "grid.json"
    result = eval_main([
        "--checkpoint", str(tmp_path / "missing"), "--train-steps", "0",
        "--widths", "8,16", "--num-images", "64", "--maha",
        "--maha-fit-images", "256",
        "--corruptions", "gaussian_noise,brightness", "--out", str(out),
    ])
    assert "mean_failure_auroc_maha" in result["summary"]
    assert "mean_failure_auroc_rmd" in result["summary"]
    for fam in ("gaussian_noise", "brightness"):
        cells = result["grid"][fam]
        assert all("auroc_maha" in c and "mean_rmd" in c for c in cells.values())


def test_evaluate_maha_rejects_multi_forward():
    from fav_tpu.models.evaluate import main as eval_main

    with pytest.raises(SystemExit):
        eval_main(["--maha", "--ensemble", "3"])
    with pytest.raises(SystemExit):
        eval_main(["--maha", "--monitor", "somewhere"])


def test_fit_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(200, 6))
    labels = rng.integers(0, 3, size=200)
    from fav_tpu.models.mahalanobis import load_fit, save_fit

    fit = fit_feature_gaussians(feats, labels, 3)
    import dataclasses

    fit = dataclasses.replace(fit, rmd_q50=1.5, rmd_q99=9.0)
    path = str(tmp_path / "maha_fit.npz")
    save_fit(path, fit)
    back = load_fit(path)
    np.testing.assert_allclose(np.asarray(back.prec), np.asarray(fit.prec), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.class_means), np.asarray(fit.class_means), rtol=1e-6)
    assert back.rmd_q50 == 1.5 and back.rmd_q99 == 9.0
    q = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
    a = mahalanobis_scores(q, fit)
    b = mahalanobis_scores(q, back)
    np.testing.assert_allclose(np.asarray(a["rmd"]), np.asarray(b["rmd"]), rtol=1e-6)


def test_normalized_rmd_scale():
    import dataclasses

    from fav_tpu.models.mahalanobis import normalized_rmd

    rng = np.random.default_rng(4)
    feats = rng.normal(size=(100, 4))
    fit = fit_feature_gaussians(feats, rng.integers(0, 2, 100), 2)
    fit = dataclasses.replace(fit, rmd_q50=2.0, rmd_q99=12.0)
    got = np.asarray(normalized_rmd(jnp.asarray([2.0, 12.0, -50.0, 22.0]), fit))
    np.testing.assert_allclose(got, [0.0, 1.0, 0.0, 2.0], atol=1e-6)


@pytest.mark.slow
def test_serving_streams_feature_distance(tmp_path):
    """With a maha_fit.npz next to the checkpoint, the msp InferenceService
    streams a per-frame feature_distance; without one, the field is absent
    and the packed-row layout is unchanged."""
    import asyncio
    import dataclasses

    from fav_tpu.models.mahalanobis import (
        FIT_FILENAME,
        mahalanobis_scores as _scores,
        save_fit,
    )
    from fav_tpu.serving.inference import InferenceService
    from fav_tpu.utils.checkpoint import save_checkpoint

    model = create_model(SMALL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ckpt = str(tmp_path / "maha_ckpt")
    save_checkpoint(ckpt, params, metadata={
        "temperature": 1.0, "widths": list(SMALL.widths),
        "dense_width": SMALL.dense_width,
    })
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (64, 32, 32, 3)), jnp.float32)
    feats = collect_features(model, params, images)
    fit = fit_feature_gaussians(feats, rng.integers(0, 10, 64), 10)
    rmd = np.asarray(_scores(jnp.asarray(feats), fit)["rmd"], np.float64)
    fit = dataclasses.replace(fit, rmd_q50=float(np.quantile(rmd, 0.5)),
                              rmd_q99=float(np.quantile(rmd, 0.99)))
    save_fit(os.path.join(ckpt, FIT_FILENAME), fit)

    async def run(service):
        frame = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        res = await service.score_frame(frame)
        await service.close()
        return res

    svc = InferenceService(SMALL, checkpoint_dir=ckpt)
    res = asyncio.run(run(svc))
    assert svc.has_feature_distance  # resolved at (lazy) model build
    assert svc.info().get("feature_distance") is True
    assert "feature_distance" in res and res["feature_distance"] >= 0.0
    assert "confidence" in res and "conformal_set_size" not in res

    os.remove(os.path.join(ckpt, FIT_FILENAME))
    svc2 = InferenceService(SMALL, checkpoint_dir=ckpt)
    res2 = asyncio.run(run(svc2))
    assert not svc2.has_feature_distance
    assert "feature_distance" not in res2


@pytest.mark.slow
def test_fit_maha_cli(tmp_path):
    """tools/fit_maha.py writes a loadable fit with sane quantiles."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import fit_maha

    from fav_tpu.models.mahalanobis import FIT_FILENAME, load_fit
    from fav_tpu.utils.checkpoint import save_checkpoint

    model = create_model(SMALL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, params, metadata={
        "widths": list(SMALL.widths), "dense_width": SMALL.dense_width,
    })
    fit_maha.main(["--checkpoint", ckpt, "--fit-images", "256"])
    fit = load_fit(os.path.join(ckpt, FIT_FILENAME))
    assert fit.rmd_q99 > fit.rmd_q50
    assert fit.class_means.shape == (10, SMALL.dense_width)


def test_fit_rejects_out_of_range_labels():
    """Labels outside [0, C) must fail loudly — uninitialized centered rows
    silently polluting the pooled covariance is the alternative (ADVICE r3)."""
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(32, 4))
    bad = rng.integers(0, 2, 32)
    bad[5] = 7  # out of range for num_classes=2
    with pytest.raises(ValueError, match="outside"):
        fit_feature_gaussians(feats, bad, 2)


@pytest.mark.slow
def test_serving_ignores_stale_maha_fit(tmp_path, capsys):
    """A maha_fit.npz whose feature dim mismatches the checkpoint's model
    (stale fit after a width change) must NOT take down msp serving: the
    service warns and serves without feature_distance (ADVICE r3)."""
    import asyncio
    import dataclasses

    from fav_tpu.models.mahalanobis import FIT_FILENAME, save_fit
    from fav_tpu.serving.inference import InferenceService
    from fav_tpu.utils.checkpoint import save_checkpoint

    model = create_model(SMALL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ckpt = str(tmp_path / "stale_ckpt")
    save_checkpoint(ckpt, params, metadata={
        "temperature": 1.0, "widths": list(SMALL.widths),
        "dense_width": SMALL.dense_width,
    })
    # fit at the WRONG width (8 != SMALL.dense_width)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(64, 8))
    fit = fit_feature_gaussians(feats, rng.integers(0, 10, 64), 10)
    fit = dataclasses.replace(fit, rmd_q50=1.0, rmd_q99=2.0)
    save_fit(os.path.join(ckpt, FIT_FILENAME), fit)

    svc = InferenceService(SMALL, checkpoint_dir=ckpt)

    async def run():
        frame = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        res = await svc.score_frame(frame)
        await svc.close()
        return res

    res = asyncio.run(run())
    assert svc.degraded is False  # weights restored fine
    assert not svc.has_feature_distance
    assert "feature_distance" not in res
    assert "confidence" in res  # serving itself is unaffected
