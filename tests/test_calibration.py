"""Calibration metrics vs. sklearn/NumPy oracles (SURVEY.md §7: build the
sklearn-based oracle first, then match the jnp version within tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from fav_tpu.models.calibration import (
    auroc,
    brier_score,
    expected_calibration_error,
    failure_labels,
    fit_temperature,
    nll,
    reliability_diagram,
)


def _ece_oracle(conf, correct, num_bins):
    """Plain-NumPy ECE with the same right-closed equal-width bins."""
    conf = np.asarray(conf, np.float64)
    correct = np.asarray(correct, np.float64)
    bins = np.clip(np.ceil(conf * num_bins).astype(int) - 1, 0, num_bins - 1)
    total = 0.0
    for b in range(num_bins):
        m = bins == b
        if m.sum() == 0:
            continue
        total += m.sum() * abs(correct[m].mean() - conf[m].mean())
    return total / len(conf)


@pytest.mark.parametrize("num_bins", [10, 15])
def test_ece_matches_oracle(num_bins):
    rng = np.random.default_rng(0)
    conf = rng.uniform(0.01, 1.0, 500)
    correct = (rng.uniform(0, 1, 500) < conf * 0.8).astype(np.float64)
    got = float(expected_calibration_error(jnp.asarray(conf), jnp.asarray(correct), num_bins))
    want = _ece_oracle(conf, correct, num_bins)
    assert got == pytest.approx(want, abs=1e-6)


def test_ece_perfectly_calibrated_is_small():
    rng = np.random.default_rng(1)
    conf = rng.uniform(0.05, 0.95, 20000)
    correct = (rng.uniform(0, 1, 20000) < conf).astype(np.float64)
    assert float(expected_calibration_error(jnp.asarray(conf), jnp.asarray(correct))) < 0.02


def test_reliability_diagram_bins():
    conf = jnp.asarray([0.05, 0.55, 0.95, 0.92])
    correct = jnp.asarray([0.0, 1.0, 1.0, 0.0])
    d = reliability_diagram(conf, correct, 10)
    assert float(d["bin_count"][0]) == 1
    assert float(d["bin_count"][9]) == 2
    assert float(d["bin_accuracy"][9]) == pytest.approx(0.5)


@pytest.mark.parametrize("ties", [False, True])
def test_auroc_matches_sklearn(ties):
    rng = np.random.default_rng(2)
    scores = rng.normal(0, 1, 400)
    labels = (rng.uniform(0, 1, 400) < jax.nn.sigmoid(scores)).astype(int)
    if ties:
        scores = np.round(scores, 1)  # force many ties
    got = float(auroc(jnp.asarray(scores), jnp.asarray(labels)))
    want = roc_auc_score(labels, scores)
    assert got == pytest.approx(want, abs=1e-9)


@pytest.mark.parametrize("ties", [False, True])
def test_aupr_matches_sklearn(ties):
    from sklearn.metrics import average_precision_score

    from fav_tpu.models.calibration import aupr

    rng = np.random.default_rng(5)
    scores = rng.normal(0, 1, 400)
    labels = (rng.uniform(0, 1, 400) < jax.nn.sigmoid(scores)).astype(int)
    if ties:
        scores = np.round(scores, 1)
    got = float(aupr(jnp.asarray(scores), jnp.asarray(labels)))
    want = average_precision_score(labels, scores)
    assert got == pytest.approx(want, abs=1e-6)


def test_fpr_at_95_tpr_matches_numpy_oracle():
    from sklearn.metrics import roc_curve

    from fav_tpu.models.calibration import fpr_at_95_tpr

    rng = np.random.default_rng(6)
    scores = rng.normal(0, 1, 500)
    labels = (rng.uniform(0, 1, 500) < jax.nn.sigmoid(scores)).astype(int)
    got = float(fpr_at_95_tpr(jnp.asarray(scores), jnp.asarray(labels)))
    fpr, tpr, _ = roc_curve(labels, scores)
    want = float(fpr[np.searchsorted(tpr, 0.95, side="left")])
    assert got == pytest.approx(want, abs=1e-9)
    # degenerate: no failures at all -> defined fallback of 1.0
    assert float(fpr_at_95_tpr(jnp.asarray(scores), jnp.zeros(500))) == 1.0


def test_fpr_at_95_tpr_tied_scores_matches_sklearn():
    """Tied scores (saturated softmax confidences tie routinely): only
    tie-block ends are realizable thresholds, so the operating point must
    match sklearn's roc_curve, which groups ties (round-2 advisor finding:
    interior-of-tie indices reported FPRs no threshold can realize)."""
    from sklearn.metrics import roc_curve

    from fav_tpu.models.calibration import fpr_at_95_tpr

    rng = np.random.default_rng(11)
    for trial in range(5):
        scores = np.round(rng.normal(0, 1, 400), 1)  # heavy ties
        labels = (rng.uniform(0, 1, 400) < jax.nn.sigmoid(scores)).astype(int)
        got = float(fpr_at_95_tpr(jnp.asarray(scores), jnp.asarray(labels)))
        fpr, tpr, _ = roc_curve(labels, scores)
        want = float(fpr[np.searchsorted(tpr, 0.95, side="left")])
        assert got == pytest.approx(want, abs=1e-9), trial
    # extreme: one giant tie block containing the 95% crossing
    scores = np.concatenate([np.full(300, 0.5), np.linspace(0.6, 1.0, 100)])
    labels = np.concatenate([np.zeros(250), np.ones(50), np.ones(100)]).astype(int)
    got = float(fpr_at_95_tpr(jnp.asarray(scores), jnp.asarray(labels)))
    fpr, tpr, _ = roc_curve(labels, scores)
    want = float(fpr[np.searchsorted(tpr, 0.95, side="left")])
    assert got == pytest.approx(want, abs=1e-9)


def test_auroc_perfect_and_random():
    s = jnp.asarray([0.1, 0.2, 0.8, 0.9])
    y = jnp.asarray([0, 0, 1, 1])
    assert float(auroc(s, y)) == 1.0
    assert float(auroc(s, jnp.asarray([1, 1, 0, 0]))) == 0.0


def test_temperature_recovers_known_scale():
    """Generate calibrated logits, multiply by 3 (overconfident), and check
    fit_temperature recovers T ~ 3 and strictly reduces NLL."""
    rng = np.random.default_rng(3)
    n, c = 4000, 10
    true_logits = rng.normal(0, 2, (n, c))
    probs = np.exp(true_logits) / np.exp(true_logits).sum(-1, keepdims=True)
    labels = np.array([rng.choice(c, p=p) for p in probs], np.int32)
    hot_logits = jnp.asarray(true_logits * 3.0, jnp.float32)
    t = float(fit_temperature(hot_logits, jnp.asarray(labels)))
    assert t == pytest.approx(3.0, rel=0.15)
    assert float(nll(hot_logits, jnp.asarray(labels), t)) < float(
        nll(hot_logits, jnp.asarray(labels), 1.0)
    )


def test_temperature_scaling_improves_ece():
    rng = np.random.default_rng(4)
    n, c = 4000, 10
    true_logits = rng.normal(0, 2, (n, c))
    probs = np.exp(true_logits) / np.exp(true_logits).sum(-1, keepdims=True)
    labels = np.array([rng.choice(c, p=p) for p in probs], np.int32)
    hot = jnp.asarray(true_logits * 4.0, jnp.float32)
    y = jnp.asarray(labels)
    t = fit_temperature(hot, y)
    conf_before = jnp.max(jax.nn.softmax(hot, -1), -1)
    conf_after = jnp.max(jax.nn.softmax(hot / t, -1), -1)
    correct = (jnp.argmax(hot, -1) == y).astype(jnp.float64)
    ece_before = float(expected_calibration_error(conf_before, correct))
    ece_after = float(expected_calibration_error(conf_after, correct))
    assert ece_after < ece_before * 0.5


def test_brier_and_failure_labels():
    probs = jnp.asarray([[1.0, 0.0], [0.5, 0.5]])
    labels = jnp.asarray([0, 1])
    assert float(brier_score(probs, labels)) == pytest.approx(0.25)
    preds = jnp.asarray([0, 0])
    np.testing.assert_array_equal(np.asarray(failure_labels(preds, labels)), [0, 1])


@pytest.mark.slow
def test_failure_detection_pipeline_auroc():
    """Uncertainty must rank failures above successes on a trained model —
    the reference's core claim (failure = high-confidence wrong prediction,
    reference README.md:22-24) measured as AUROC > 0.5 by a clear margin."""
    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import synthetic_cifar10
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.train import classifier_eval_step, train_classifier

    model = create_model(ModelParams(widths=(16, 32), dense_width=32))
    ds = synthetic_cifar10(train_size=2048, test_size=512, seed=5)
    params, _ = train_classifier(model, ds, num_steps=120, batch_size=128, learning_rate=2e-3)
    out = classifier_eval_step(
        model.apply, params, jnp.asarray(ds.test_images), jnp.asarray(ds.test_labels)
    )
    logits = out["logits"]
    conf = jnp.max(jax.nn.softmax(logits, -1), -1)
    preds = jnp.argmax(logits, -1)
    fails = failure_labels(preds, jnp.asarray(ds.test_labels))
    if int(fails.sum()) >= 5:  # need some failures to rank
        score = float(auroc(1.0 - conf, fails))
        assert score > 0.6
