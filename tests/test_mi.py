"""BALD mutual-information scoring in the corruption sweeps
(fav_tpu/parallel/sweep.py:_member_mi / _reduce_members).

Multi-forward scorers (ensembles, MC-dropout) hand the sweep stacked member
logits [M, B, C]; the sweep keeps predictions on the logit average (bitwise
what the old mean-apply path computed) and additionally scores the members'
epistemic disagreement (Houlsby et al. 2011: H(mean p) - mean H(p)) as a
third failure-detection signal next to MSP and energy. The reference defines
failure as a high-confidence wrong prediction (reference README.md:22-24) —
an epistemic event the MSP of an averaged distribution cannot decompose."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.parallel.sweep import (
    _member_mi,
    corruption_sweep,
    fused_sweep,
)


def _np_mi(logits, t):
    z = np.asarray(logits, np.float64) / t
    z = z - z.max(axis=-1, keepdims=True)
    p = np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True)
    mean_p = p.mean(axis=0)
    h_mean = -(mean_p * np.log(np.where(mean_p > 0, mean_p, 1.0))).sum(-1)
    h_m = -(p * np.log(np.where(p > 0, p, 1.0))).sum(-1)
    return h_mean - h_m.mean(axis=0)


def test_member_mi_matches_numpy_oracle():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 10)) * 3.0
    got = np.asarray(_member_mi(logits, 1.3))
    want = _np_mi(np.asarray(logits), 1.3)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert (got >= -1e-6).all()  # MI is non-negative


def test_member_mi_zero_for_identical_members():
    one = jax.random.normal(jax.random.PRNGKey(1), (32, 10))
    logits = jnp.stack([one, one, one])
    mi = np.asarray(_member_mi(logits, 1.0))
    np.testing.assert_allclose(mi, 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_inputs():
    key = jax.random.PRNGKey(7)
    images = jax.random.uniform(key, (32, 32, 32, 3))
    labels = jnp.arange(32) % 10
    # fake M=3-member model: stacked linear heads over flattened pixels
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 32 * 32 * 3, 10)) * 0.05

    def member_apply(p, x):
        flat = x.reshape(x.shape[0], -1)
        return jnp.einsum("bi,mio->mbo", flat, p)

    return images, labels, w, member_apply


def test_fused_sweep_scores_mi_and_keeps_predictions(tiny_inputs):
    images, labels, w, member_apply = tiny_inputs
    key = jax.random.PRNGKey(42)
    kw = dict(corruptions=("brightness",), severities=(1, 3), temperature=1.1)

    stacked = fused_sweep(member_apply, w, images, labels, key, **kw)
    mean_apply = lambda p, x: jnp.mean(member_apply(p, x), axis=0)  # noqa: E731
    flat = fused_sweep(mean_apply, w, images, labels, key, **kw)

    for sev in (1, 3):
        s, f = stacked["brightness"][sev], flat["brightness"][sev]
        # the member axis must not change predictions or MSP metrics
        for m in ("accuracy", "mean_confidence", "auroc", "ece"):
            assert s[m] == pytest.approx(f[m], abs=1e-6)
        assert "auroc_mi" not in f
        assert s["mean_mi"] >= 0.0
        assert 0.0 <= s["auroc_mi"] <= 1.0


def test_vote_gate_rows(tiny_inputs):
    images, labels, w, member_apply = tiny_inputs
    key = jax.random.PRNGKey(42)
    kw = dict(corruptions=("brightness",), severities=(1,), temperature=1.0)
    cell = fused_sweep(member_apply, w, images, labels, key, **kw)["brightness"][1]
    # agreement is the fraction of members voting the ensemble argmax —
    # per-sample in {0, 1/3, 2/3, 1} (0 is possible: the logit average can
    # land on a class no member individually ranks first)
    assert 0.0 <= cell["mean_agreement"] <= 1.0
    # min-gating can only lower the operative confidence
    assert cell["mean_confidence_vote"] <= cell["mean_confidence"] + 1e-6
    assert 0.0 <= cell["auroc_vote"] <= 1.0 and cell["ece_vote"] >= 0.0

    # identical members: full agreement, gate is a no-op on every metric
    w_same = jnp.stack([w[0], w[0], w[0]])
    same = fused_sweep(member_apply, w_same, images, labels, key, **kw)["brightness"][1]
    assert same["mean_agreement"] == pytest.approx(1.0)
    assert same["mean_confidence_vote"] == pytest.approx(same["mean_confidence"], abs=1e-6)
    assert same["auroc_vote"] == pytest.approx(same["auroc"], abs=1e-6)
    assert same["ece_vote"] == pytest.approx(same["ece"], abs=1e-6)


def test_per_cell_path_matches_fused_mi(tiny_inputs):
    images, labels, w, member_apply = tiny_inputs
    key = jax.random.PRNGKey(42)
    kw = dict(corruptions=("brightness",), severities=(1,), temperature=1.0)
    fused = fused_sweep(member_apply, w, images, labels, key, **kw)
    cellwise = corruption_sweep(member_apply, w, images, labels, key, **kw)
    f, c = fused["brightness"][1], cellwise["brightness"][1]
    for m in ("mean_mi", "auroc_mi", "mean_agreement", "auroc_vote",
              "ece_vote", "mean_confidence_vote"):
        assert c[m] == pytest.approx(f[m], abs=1e-5), m
