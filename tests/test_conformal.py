"""Conformal prediction vs NumPy oracles + the coverage guarantee itself.

The split-conformal guarantee (P[y in set] >= 1 - alpha for exchangeable
data) is checked empirically on a synthetic generative model where the
calibration and test splits are exchangeable by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fav_tpu.models.conformal import (
    aps_all_scores,
    aps_scores,
    conformal_quantile,
    coverage,
    lac_scores,
    prediction_sets,
    set_sizes,
)


def _np_aps_all(probs):
    """Oracle: inclusive cumulative mass in descending-prob order."""
    out = np.zeros_like(probs)
    for i, p in enumerate(probs):
        order = np.argsort(-p, kind="stable")
        cum = np.cumsum(p[order])
        for rank, c in enumerate(order):
            out[i, c] = cum[rank]
    return out


def _softmax_rows(rng, n, c, sharp=3.0):
    z = rng.standard_normal((n, c)) * sharp
    e = np.exp(z - z.max(axis=1, keepdims=True))
    return (e / e.sum(axis=1, keepdims=True)).astype(np.float32)


def test_aps_scores_match_numpy_oracle():
    rng = np.random.default_rng(0)
    probs = _softmax_rows(rng, 64, 10)
    labels = rng.integers(0, 10, 64)
    got = np.asarray(aps_all_scores(jnp.asarray(probs)))
    want = _np_aps_all(probs)
    np.testing.assert_allclose(got, want, atol=1e-5)
    true_got = np.asarray(aps_scores(jnp.asarray(probs), jnp.asarray(labels)))
    np.testing.assert_allclose(true_got, want[np.arange(64), labels], atol=1e-5)


def test_conformal_quantile_matches_textbook_formula():
    rng = np.random.default_rng(1)
    for n, alpha in [(100, 0.1), (37, 0.2), (500, 0.05)]:
        s = rng.uniform(size=n).astype(np.float32)
        k = int(np.ceil((n + 1) * (1 - alpha)))
        want = np.sort(s)[k - 1]
        got = float(conformal_quantile(jnp.asarray(s), alpha))
        assert got == pytest.approx(want, abs=1e-7)
    # alpha too small for n -> +inf threshold (full sets, never invalid)
    assert np.isinf(float(conformal_quantile(jnp.asarray(np.ones(5, np.float32)), 0.01)))


def test_lac_score_definition_and_sets():
    probs = jnp.asarray([[0.7, 0.2, 0.1], [0.4, 0.35, 0.25]], jnp.float32)
    labels = jnp.asarray([0, 2])
    np.testing.assert_allclose(
        np.asarray(lac_scores(probs, labels)), [0.3, 0.75], atol=1e-6
    )
    mask = prediction_sets(probs, 0.65, score="lac")
    # class in set iff 1 - p_c <= 0.65 i.e. p_c >= 0.35
    np.testing.assert_array_equal(
        np.asarray(mask), [[True, False, False], [True, True, False]]
    )


def test_aps_sets_never_empty_and_match_threshold_rule():
    rng = np.random.default_rng(2)
    probs = _softmax_rows(rng, 128, 10)
    qhat = 0.0  # impossible threshold: only the forced argmax survives
    mask = np.asarray(prediction_sets(jnp.asarray(probs), qhat))
    assert (mask.sum(axis=1) == 1).all()
    assert (mask.argmax(axis=1) == probs.argmax(axis=1)).all()
    qhat = 0.8
    mask = np.asarray(prediction_sets(jnp.asarray(probs), qhat))
    want = (_np_aps_all(probs) <= qhat)
    want[np.arange(len(probs)), probs.argmax(axis=1)] = True
    np.testing.assert_array_equal(mask, want)


def test_rank_penalty_shrinks_deep_sets():
    rng = np.random.default_rng(3)
    probs = _softmax_rows(rng, 256, 10, sharp=0.5)  # flat rows -> deep sets
    plain = np.asarray(set_sizes(prediction_sets(jnp.asarray(probs), 0.9)))
    raps = np.asarray(set_sizes(
        prediction_sets(jnp.asarray(probs), 0.9, rank_penalty=0.05, k_reg=2)
    ))
    assert raps.mean() < plain.mean()
    assert raps.max() <= plain.max()


@pytest.mark.parametrize("score", ["aps", "lac"])
def test_split_conformal_coverage_guarantee(score):
    """On exchangeable cal/test splits, empirical coverage lands at
    1 - alpha (within binomial noise) — the guarantee the module exists
    to provide. The generative model has real Bayes error so sets are
    non-trivial."""
    rng = np.random.default_rng(4)
    n_cal, n_test, c = 2000, 4000, 10
    centers = rng.standard_normal((c, 8))
    y = rng.integers(0, c, n_cal + n_test)
    x = centers[y] + rng.standard_normal((n_cal + n_test, 8)) * 1.2
    # a (miscalibrated) scorer: negative distances as logits
    d2 = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
    logits = -d2 / 4.0
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = (e / e.sum(axis=1, keepdims=True)).astype(np.float32)

    alpha = 0.1
    pc, yc = jnp.asarray(probs[:n_cal]), jnp.asarray(y[:n_cal])
    pt, yt = jnp.asarray(probs[n_cal:]), jnp.asarray(y[n_cal:])
    if score == "aps":
        cal = aps_scores(pc, yc, key=jax.random.PRNGKey(0))
    else:
        cal = lac_scores(pc, yc)
    qhat = conformal_quantile(cal, alpha)
    mask = prediction_sets(pt, qhat, score=score,
                           key=jax.random.PRNGKey(1) if score == "aps" else None)
    cov = float(coverage(mask, yt))
    # binomial s.e. at n=4000 is ~0.005; randomized scores are tight at
    # 1-alpha, unrandomized LAC can sit slightly above
    assert cov >= 1 - alpha - 0.02, cov
    assert cov <= 1 - alpha + 0.04, cov
    assert 1.0 < float(jnp.mean(set_sizes(mask).astype(jnp.float32))) < c


def test_coverage_takes_true_label_membership():
    mask = jnp.asarray([[True, False], [False, True], [False, False]])
    labels = jnp.asarray([0, 0, 1])
    assert float(coverage(mask, labels)) == pytest.approx(1 / 3)
