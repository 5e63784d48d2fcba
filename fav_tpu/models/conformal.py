"""Split-conformal prediction: distribution-free risk control for the
failure-aware contract.

The reference's ODD defines failure as an *incorrect prediction with high
confidence* (reference README.md:22-24) and its safety envelope is built
from hand-tuned thresholds (reference platform/README.md:58-64, "bounded
ML" invariants). Conformal prediction is the principled version of that
bound: calibrate a score threshold on n held-out clean samples and the
prediction *set* {classes with score <= qhat} covers the true label with
probability >= 1 - alpha for any exchangeable test point — a finite-sample,
model-agnostic guarantee (Vovk et al.; split-conformal as in Romano et al.
2020 "Classification with Valid and Adaptive Coverage" [APS] and
Angelopoulos et al. 2021 [RAPS-style rank penalty]).

Under distribution shift the guarantee is void — which is exactly what this
module measures: coverage on the clean split certifies the machinery, and
the per-cell coverage/set-size across the 15x5 corruption grid quantifies
how far each corruption pushes the deployment out of the certified regime
(set size is a per-sample difficulty signal; coverage collapse is a
distribution-level failure alarm the trust engine can consume).

Everything is pure jnp, static-shape and jittable (sorts + cumsums, no
data-dependent control flow); tests cross-check a NumPy oracle
(tests/test_conformal.py) per the "oracle first" rule (SURVEY.md §7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "lac_scores",
    "aps_scores",
    "aps_all_scores",
    "conformal_quantile",
    "prediction_sets",
    "coverage",
    "set_sizes",
    "attach_conformal_metrics",
]


def lac_scores(probs: jax.Array, labels: jax.Array) -> jax.Array:
    """LAC ("least ambiguous set-valued classifier") conformity score:
    ``1 - p_true``. Smallest average sets of any valid score, but coverage
    is marginal only — hard examples get under-covered."""
    p_true = jnp.take_along_axis(probs, labels[..., None], axis=-1)[..., 0]
    return 1.0 - p_true


def _aps_cumulative(probs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-class APS mass: for each class c, the total probability of all
    classes ranked at or above c (descending-prob order, inclusive of c).
    Returns (cummass_inclusive[B, C], rank[B, C] with 0 = argmax)."""
    order = jnp.argsort(-probs, axis=-1)
    sorted_p = jnp.take_along_axis(probs, order, axis=-1)
    cum_incl = jnp.cumsum(sorted_p, axis=-1)
    # scatter back to class positions
    inv = jnp.argsort(order, axis=-1)
    cummass = jnp.take_along_axis(cum_incl, inv, axis=-1)
    ranks = inv  # position of each class in the descending sort
    return cummass, ranks


def aps_all_scores(
    probs: jax.Array,
    key: jax.Array | None = None,
    rank_penalty: float = 0.0,
    k_reg: int = 1,
) -> jax.Array:
    """APS conformity score for EVERY class: ``sum of probs ranked above c
    plus p_c`` (inclusive cumulative mass), optionally randomized by
    subtracting ``u * p_c`` (u ~ U[0,1], one draw per sample — the exact
    Romano et al. randomization that makes coverage tight rather than
    conservative), plus a RAPS-style rank penalty
    ``rank_penalty * max(0, rank + 1 - k_reg)`` that discourages deep sets.

    Shape: probs [B, C] -> scores [B, C]. The true-label calibration score
    is ``take_along_axis(aps_all_scores(p), y)`` — computed by
    :func:`aps_scores`.
    """
    cummass, ranks = _aps_cumulative(probs)
    if key is not None:
        u = jax.random.uniform(key, probs.shape[:-1] + (1,), probs.dtype)
        cummass = cummass - u * probs
    if rank_penalty > 0.0:
        cummass = cummass + rank_penalty * jnp.maximum(
            0.0, ranks.astype(probs.dtype) + 1.0 - float(k_reg)
        )
    return cummass


def aps_scores(
    probs: jax.Array,
    labels: jax.Array,
    key: jax.Array | None = None,
    rank_penalty: float = 0.0,
    k_reg: int = 1,
) -> jax.Array:
    """True-label APS conformity scores [B] for calibration."""
    allscores = aps_all_scores(probs, key, rank_penalty, k_reg)
    return jnp.take_along_axis(allscores, labels[..., None], axis=-1)[..., 0]


@functools.partial(jax.jit, static_argnums=(1,))
def conformal_quantile(scores: jax.Array, alpha: float) -> jax.Array:
    """Finite-sample-corrected (1-alpha) quantile of n calibration scores:
    the ``ceil((n+1)(1-alpha))``-th smallest score (Vovk's split-conformal
    threshold). If the correction exceeds n (alpha too small for n), the
    threshold is +inf — sets become the full label space, never invalid."""
    s = jnp.sort(scores.reshape(-1))
    n = s.shape[0]
    k = jnp.ceil((n + 1) * (1.0 - alpha)).astype(jnp.int32)  # 1-indexed
    return jnp.where(k > n, jnp.inf, s[jnp.clip(k - 1, 0, n - 1)])


def prediction_sets(
    probs: jax.Array,
    qhat: jax.Array | float,
    score: str = "aps",
    key: jax.Array | None = None,
    rank_penalty: float = 0.0,
    k_reg: int = 1,
) -> jax.Array:
    """Boolean membership mask [B, C]: class c is in the set iff its
    conformity score <= qhat. ``score`` picks "aps" (adaptive) or "lac"
    (1 - p_c thresholding). APS sets are never empty: the argmax class has
    the smallest inclusive cumulative mass of the row and randomization
    subtracts at most p_argmax, keeping it the row minimum."""
    if score == "lac":
        return (1.0 - probs) <= qhat
    if score != "aps":
        raise ValueError(f"unknown conformal score {score!r}")
    allscores = aps_all_scores(probs, key, rank_penalty, k_reg)
    member = allscores <= qhat
    # guarantee non-empty: always include the row-minimum-score class
    min_idx = jnp.argmin(allscores, axis=-1, keepdims=True)
    force = jnp.zeros_like(member).at[
        jnp.arange(member.shape[0])[:, None], min_idx
    ].set(True)
    return member | force


def coverage(sets_mask: jax.Array, labels: jax.Array) -> jax.Array:
    """Fraction of samples whose true label is in the prediction set."""
    hit = jnp.take_along_axis(sets_mask, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(hit.astype(jnp.float32))


def set_sizes(sets_mask: jax.Array) -> jax.Array:
    """Per-sample set cardinality [B] — the conformal difficulty signal."""
    return jnp.sum(sets_mask.astype(jnp.int32), axis=-1)


def calibration_metadata(
    probs_val: jax.Array,
    labels_val: jax.Array,
    alpha: float = 0.1,
    key: jax.Array | None = None,
) -> dict:
    """Checkpoint-metadata entries for deploy-time conformal sets.

    Called at train time on the temperature-calibration split (the same
    held-out clean data the temperature fits on): serving reads
    ``conformal_qhat`` back and reports each frame's prediction-set size as
    a difficulty signal (fav_tpu/serving/inference.py). Randomized APS at
    calibration, deterministic thresholding at deployment — deterministic
    sets are a superset of randomized ones, so deployed coverage is
    conservative (never below the certificate)."""
    scores = aps_scores(
        probs_val, labels_val, key=key if key is not None else jax.random.PRNGKey(13)
    )
    return {
        "conformal_alpha": alpha,
        "conformal_qhat": round(float(conformal_quantile(scores, alpha)), 5),
    }


def attach_conformal_metrics(
    grid: dict,
    cells,
    cell_probs,
    labels: jax.Array,
    apply_fn,
    params,
    temperature,
    cal_images: jax.Array,
    cal_labels: jax.Array,
    alpha: float,
) -> dict:
    """Conformal coverage-under-shift for an evaluated grid.

    The held-out clean pool splits in half: the first half calibrates
    ``qhat`` (randomized APS scores), the second half measures CLEAN
    coverage — by the split-conformal guarantee it must land at
    ``1 - alpha`` up to binomial noise, certifying the machinery before any
    shift is applied. Each grid cell (prob rows shipped by
    ``fused_sweep(return_probs=True)``) then gets ``coverage`` and mean
    ``set_size`` written into its metric dict; the returned summary reports
    the clean certificate and how coverage degrades by severity.
    """
    n_cal_pool = int(cal_labels.shape[0])
    if n_cal_pool < 100:
        raise ValueError(
            f"conformal calibration needs held-out clean data: only "
            f"{n_cal_pool} images beyond the grid split (lower --num-images)"
        )
    half = n_cal_pool // 2
    fwd = jax.jit(lambda p, x: jax.nn.softmax(apply_fn(p, x) / temperature, axis=-1))
    probs_cal = fwd(params, cal_images[:half])
    probs_clean = fwd(params, cal_images[half:])
    key = jax.random.PRNGKey(13)
    qhat = conformal_quantile(
        aps_scores(probs_cal, cal_labels[:half], key=key), alpha
    )
    clean_mask = prediction_sets(probs_clean, qhat, key=jax.random.fold_in(key, 1))
    clean_cov = float(coverage(clean_mask, cal_labels[half:]))
    clean_size = float(jnp.mean(set_sizes(clean_mask).astype(jnp.float32)))

    by_sev: dict[int, list] = {}
    for i, (name, sev) in enumerate(cells):
        mask = prediction_sets(
            jnp.asarray(cell_probs[i]), qhat, key=jax.random.fold_in(key, 100 + i)
        )
        cov = float(coverage(mask, labels))
        size = float(jnp.mean(set_sizes(mask).astype(jnp.float32)))
        grid[name][sev]["coverage"] = cov
        grid[name][sev]["set_size"] = size
        by_sev.setdefault(int(sev), []).append((cov, size))

    worst = min((grid[n][s]["coverage"], n, s) for n, s in cells)
    return {
        "alpha": alpha,
        "qhat": float(qhat),
        "calibration_n": half,
        "clean_coverage": round(clean_cov, 4),
        "clean_set_size": round(clean_size, 3),
        "coverage_by_severity": {
            s: round(sum(c for c, _ in v) / len(v), 4)
            for s, v in sorted(by_sev.items())
        },
        "set_size_by_severity": {
            s: round(sum(z for _, z in v) / len(v), 3)
            for s, v in sorted(by_sev.items())
        },
        "worst_cell": {"corruption": worst[1], "severity": worst[2],
                       "coverage": round(worst[0], 4)},
    }
