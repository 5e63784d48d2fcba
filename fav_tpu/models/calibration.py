"""Calibration + failure-detection metrics: temperature scaling, ECE,
reliability diagrams, AUROC.

The reference's evaluation methodology is CSV-log evidence, not metrics code
(reference docs/system_notes.md:199-257); BASELINE.md pins the TPU build to
"failure-detection AUROC and ECE matching the CPU reference". This module is
the jnp implementation; tests cross-check every function against
sklearn/NumPy oracles (the "build the sklearn oracle first" rule,
SURVEY.md §7 hard parts).

Everything is pure and jittable: ECE is a fixed-bin segment-sum, AUROC is the
Mann-Whitney U statistic via ranking (exact, tie-aware), and temperature
scaling is a few Newton steps on the NLL — all static-shape, scan/vmap-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "expected_calibration_error",
    "reliability_diagram",
    "fit_temperature",
    "nll",
    "brier_score",
    "auroc",
    "failure_labels",
]


@functools.partial(jax.jit, static_argnums=(2,))
def expected_calibration_error(
    confidence: jax.Array, correct: jax.Array, num_bins: int = 15
) -> jax.Array:
    """ECE with equal-width confidence bins (Guo et al. 2017 convention):
    ``sum_b (n_b / N) * |acc_b - conf_b|``. Bin b covers ((b)/B, (b+1)/B];
    conf==0 lands in bin 0.
    """
    conf = confidence.reshape(-1)
    corr = correct.reshape(-1).astype(conf.dtype)
    # ceil(conf * B) - 1 puts (0, 1/B] in bin 0 ... (1-1/B, 1] in bin B-1
    bins = jnp.clip(jnp.ceil(conf * num_bins).astype(jnp.int32) - 1, 0, num_bins - 1)
    n_b = jnp.zeros(num_bins, conf.dtype).at[bins].add(1.0)
    conf_b = jnp.zeros(num_bins, conf.dtype).at[bins].add(conf)
    acc_b = jnp.zeros(num_bins, conf.dtype).at[bins].add(corr)
    n_safe = jnp.maximum(n_b, 1.0)
    gap = jnp.abs(acc_b / n_safe - conf_b / n_safe)
    return jnp.sum(jnp.where(n_b > 0, n_b * gap, 0.0)) / conf.shape[0]


@functools.partial(jax.jit, static_argnums=(2,))
def reliability_diagram(
    confidence: jax.Array, correct: jax.Array, num_bins: int = 15
) -> dict[str, jax.Array]:
    """Per-bin (mean confidence, accuracy, count) for plotting/reporting."""
    conf = confidence.reshape(-1)
    corr = correct.reshape(-1).astype(conf.dtype)
    bins = jnp.clip(jnp.ceil(conf * num_bins).astype(jnp.int32) - 1, 0, num_bins - 1)
    n_b = jnp.zeros(num_bins, conf.dtype).at[bins].add(1.0)
    conf_b = jnp.zeros(num_bins, conf.dtype).at[bins].add(conf)
    acc_b = jnp.zeros(num_bins, conf.dtype).at[bins].add(corr)
    n_safe = jnp.maximum(n_b, 1.0)
    return {
        "bin_confidence": conf_b / n_safe,
        "bin_accuracy": acc_b / n_safe,
        "bin_count": n_b,
        "bin_edges": jnp.linspace(0.0, 1.0, num_bins + 1),
    }


def nll(logits: jax.Array, labels: jax.Array, temperature: jax.Array | float = 1.0) -> jax.Array:
    """Mean negative log-likelihood at a given temperature."""
    logp = jax.nn.log_softmax(logits / temperature, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))


def brier_score(probs: jax.Array, labels: jax.Array) -> jax.Array:
    onehot = jax.nn.one_hot(labels, probs.shape[-1], dtype=probs.dtype)
    return jnp.mean(jnp.sum((probs - onehot) ** 2, axis=-1))


@functools.partial(jax.jit, static_argnums=(2,))
def fit_temperature(logits: jax.Array, labels: jax.Array, num_steps: int = 50) -> jax.Array:
    """Temperature scaling (Guo et al. 2017): minimize NLL over a single
    scalar T > 0. Optimized in log-space with Newton's method — NLL(T) is
    smooth and unimodal, so ~50 damped Newton steps reach machine precision.
    Runs as one compiled ``lax.scan``; no optimizer dependency.
    """
    logits = logits.astype(jnp.float32)

    def loss(log_t):
        return nll(logits, labels, jnp.exp(log_t))

    grad = jax.grad(loss)
    hess = jax.grad(lambda lt: grad(lt))

    def step(log_t, _):
        g = grad(log_t)
        h = hess(log_t)
        # damped Newton: fall back to gradient step when curvature is tiny
        delta = jnp.where(jnp.abs(h) > 1e-8, g / jnp.abs(h), g)
        return log_t - jnp.clip(delta, -0.5, 0.5), None

    log_t, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float32), None, length=num_steps)
    return jnp.exp(log_t)


@jax.jit
def auroc(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """Exact tie-aware AUROC (Mann-Whitney U / rank statistic).

    ``labels`` are 1 for the positive class. Ties receive average rank —
    identical to ``sklearn.metrics.roc_auc_score``. Static-shape: one sort +
    two segment-sums.
    """
    s = scores.reshape(-1).astype(jnp.float64)
    y = labels.reshape(-1).astype(jnp.float64)
    n = s.shape[0]
    order = jnp.argsort(s)
    s_sorted = s[order]
    y_sorted = y[order]
    ranks_raw = jnp.arange(1, n + 1, dtype=jnp.float64)
    # average ranks within tie groups: group id = index of first equal value
    is_new = jnp.concatenate([jnp.array([True]), s_sorted[1:] != s_sorted[:-1]])
    group = jnp.cumsum(is_new) - 1
    group_sum = jnp.zeros(n, jnp.float64).at[group].add(ranks_raw)
    group_cnt = jnp.zeros(n, jnp.float64).at[group].add(1.0)
    avg_rank = (group_sum / jnp.maximum(group_cnt, 1.0))[group]
    n_pos = jnp.sum(y_sorted)
    n_neg = n - n_pos
    rank_sum_pos = jnp.sum(avg_rank * y_sorted)
    u = rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0
    return u / jnp.maximum(n_pos * n_neg, 1.0)


@jax.jit
def aupr(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """Area under the precision-recall curve (average precision).

    Step-interpolated exactly like ``sklearn.metrics.average_precision_score``:
    AP = sum_k (R_k - R_{k-1}) * P_k over descending-score thresholds, with
    ties grouped (a tie block contributes at its block-end precision).
    Static-shape: one sort + cumulative sums.
    """
    s = scores.reshape(-1).astype(jnp.float64)
    y = labels.reshape(-1).astype(jnp.float64)
    n = s.shape[0]
    order = jnp.argsort(-s)
    s_sorted = s[order]
    y_sorted = y[order]
    tp = jnp.cumsum(y_sorted)
    precision = tp / jnp.arange(1, n + 1, dtype=jnp.float64)
    n_pos = jnp.sum(y_sorted)
    recall = tp / jnp.maximum(n_pos, 1.0)
    # only the LAST element of each tie block is a valid operating point
    is_block_end = jnp.concatenate([s_sorted[1:] != s_sorted[:-1], jnp.array([True])])
    recall_prev = jnp.concatenate([jnp.array([0.0]), recall[:-1]])
    # recall delta across a block accumulates to the block end: zero interior
    # contributions by carrying recall_prev only at block boundaries
    block_start = jnp.concatenate([jnp.array([True]), s_sorted[1:] != s_sorted[:-1]])
    # recall at previous block end (0 for the first block)
    prev_end_recall = jnp.where(block_start, recall_prev, 0.0)
    # propagate the block-start previous recall to the block end via segment max
    seg = jnp.cumsum(block_start) - 1
    n_seg = n  # upper bound
    start_recall = jnp.zeros(n_seg, jnp.float64).at[seg].max(prev_end_recall)
    contrib = jnp.where(is_block_end, (recall - start_recall[seg]) * precision, 0.0)
    return jnp.sum(contrib)


@jax.jit
def fpr_at_95_tpr(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """False-positive rate at the threshold where TPR first reaches 95%.

    The standard OOD/failure-detection companion to AUROC: of the frames the
    detector must pass to catch 95% of true failures, how many clean frames
    are wrongly flagged. Lower is better.

    Only tie-block *ends* are valid operating points — a real threshold
    admits every sample sharing a score or none (same grouping as
    ``sklearn.metrics.roc_curve``), so interior indices of a tie block are
    masked out before the first-reach search.
    """
    s = scores.reshape(-1).astype(jnp.float64)
    y = labels.reshape(-1).astype(jnp.float64)
    order = jnp.argsort(-s)
    s_sorted = s[order]
    y_sorted = y[order]
    tp = jnp.cumsum(y_sorted)
    fp = jnp.cumsum(1.0 - y_sorted)
    n_pos = jnp.sum(y_sorted)
    n_neg = jnp.maximum(s.shape[0] - n_pos, 1.0)
    tpr = tp / jnp.maximum(n_pos, 1.0)
    is_block_end = jnp.concatenate([s_sorted[1:] != s_sorted[:-1], jnp.array([True])])
    reached = (tpr >= 0.95) & is_block_end  # first realizable TPR >= 0.95
    idx = jnp.argmax(reached)
    return jnp.where(jnp.any(reached), fp[idx] / n_neg, 1.0)


def failure_labels(predictions: jax.Array, labels: jax.Array) -> jax.Array:
    """Failure = misclassification (reference README.md:22-24: "incorrect
    prediction with high confidence"). Positive class for failure-detection
    AUROC scored by *uncertainty* (or 1 - confidence)."""
    return (predictions != labels).astype(jnp.int32)
