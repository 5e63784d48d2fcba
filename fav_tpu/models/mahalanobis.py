"""Feature-space failure detection: (relative) Mahalanobis distance on the
classifier's penultimate features.

Every detection signal shipped so far is logit-space (MSP, energy, BALD MI,
vote agreement) or pixel-space (AE reconstruction error). The reference's
failure definition — an *incorrect prediction with high confidence*
(reference README.md:22-24) — is exactly the case logit-space signals are
blind to: the softmax is confidently wrong because the corrupted input left
the training manifold in a direction the head happens to map onto one class.
Feature-space distance sees that departure directly:

* **Mahalanobis** (Lee et al., NeurIPS 2018): fit one Gaussian per class on
  penultimate features of the training set with a tied covariance;
  score(x) = min_c (f - mu_c)^T Sigma^-1 (f - mu_c). Higher = further from
  every class manifold = more anomalous.
* **Relative Mahalanobis** (Ren et al., 2021): subtract the distance under a
  single class-agnostic background Gaussian — RMD = MD_min - MD_bg — which
  cancels the density directions shared by all classes and is the stronger
  near-OOD score.

Both are label-free at serve time, cost one [B,C,D] einsum on top of the
forward (microscopic next to the convs), and ride the sweep's existing
single D2H as extra per-sample rows (`fav_tpu/parallel/sweep.py` extra-score
contract). The Gaussian fit is a few small matrices — per the repo's
tunnel-backend lesson (CLAUDE.md), they are closure-baked into the jitted
scorer as program constants, never passed as per-call jit arguments.

The fit runs in float64 NumPy on host (one pass over train features, a
[D,D] covariance inverse via Cholesky — trivial at D<=256) and ships f32
device constants.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MahalanobisFit",
    "collect_features",
    "features_and_logits",
    "fit_feature_gaussians",
    "load_fit",
    "mahalanobis_scores",
    "normalized_rmd",
    "save_fit",
]

FIT_FILENAME = "maha_fit.npz"  # lives next to a checkpoint's metadata.json


@dataclass(frozen=True)
class MahalanobisFit:
    """Tied-covariance class Gaussians + background Gaussian on features.

    ``prec`` / ``bg_prec`` are precision matrices (inverse shrunk
    covariance), symmetric positive definite by construction.
    """

    class_means: jnp.ndarray  # [C, D] f32
    prec: jnp.ndarray  # [D, D] f32 — tied (shared) class precision
    bg_mean: jnp.ndarray  # [D] f32
    bg_prec: jnp.ndarray  # [D, D] f32
    # train-set RMD quantiles (q50, q99) for wire normalization: serving
    # reports (rmd - q50) / (q99 - q50) clipped at 0, so ~0 means "typical
    # training frame" and 1.0 means "at the 99th percentile of training
    # data" — a scale-free per-frame OOD reading. 0/1 defaults = raw rmd.
    rmd_q50: float = 0.0
    rmd_q99: float = 1.0


def features_and_logits(model, variables, x, **apply_kwargs):
    """One forward returning (features, logits).

    Models `sow` their penultimate representation into the ``intermediates``
    collection (``fav_tpu/models/cnn.py``, ``vit.py``); sow is a no-op unless
    the collection is marked mutable, so every existing apply path (serving,
    sweeps, training) is bitwise unchanged.
    """
    logits, state = model.apply(variables, x, mutable=["intermediates"], **apply_kwargs)
    feats = state["intermediates"]["features"][0]
    return feats.astype(jnp.float32), logits


def collect_features(model, variables, images, batch_size: int = 2048):
    """Penultimate features for a dataset, chunked through one jitted pass.

    The tail chunk pads up to ``batch_size`` (static shapes — one compiled
    program regardless of N) and the padding rows are dropped on host.
    """
    n = images.shape[0]
    fn = jax.jit(lambda x: features_and_logits(model, variables, x)[0])
    out = []
    for start in range(0, n, batch_size):
        chunk = images[start : start + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        feats = np.asarray(fn(chunk))
        out.append(feats[: batch_size - pad] if pad else feats)
    return np.concatenate(out, axis=0)


def fit_feature_gaussians(
    features,
    labels,
    num_classes: int,
    shrinkage: float = 1e-2,
) -> MahalanobisFit:
    """Fit the class-conditional + background Gaussians (host, float64).

    Tied covariance: class means are per-class; the covariance pools the
    centered features of ALL classes (Lee et al. 2018 eq. 1-2). Shrinkage
    adds ``shrinkage * tr(Sigma)/D * I`` — scale-free regularization that
    keeps the inverse well-conditioned when N_c < D (tiny test configs) and
    when corruption-invariant feature dims are nearly collinear.
    """
    f = np.asarray(features, np.float64)
    y = np.asarray(labels).astype(np.int64).ravel()
    if y.min(initial=0) < 0 or y.max(initial=0) >= num_classes:
        # rows with out-of-range labels would otherwise keep whatever bytes
        # the buffer held and silently pollute the pooled covariance
        raise ValueError(
            f"labels outside [0, {num_classes}): "
            f"min={y.min()}, max={y.max()}"
        )
    n, d = f.shape
    means = np.zeros((num_classes, d))
    centered = np.empty_like(f)
    for c in range(num_classes):
        mask = y == c
        mu = f[mask].mean(axis=0) if mask.any() else np.zeros(d)
        means[c] = mu
        centered[mask] = f[mask] - mu
    cov = centered.T @ centered / max(n, 1)
    cov += shrinkage * (np.trace(cov) / d) * np.eye(d)
    prec = np.linalg.inv(np.linalg.cholesky(cov))
    prec = prec.T @ prec  # inv(cov) = L^-T L^-1, symmetric PD

    bg_mean = f.mean(axis=0)
    bg_centered = f - bg_mean
    bg_cov = bg_centered.T @ bg_centered / max(n, 1)
    bg_cov += shrinkage * (np.trace(bg_cov) / d) * np.eye(d)
    bg_prec_l = np.linalg.inv(np.linalg.cholesky(bg_cov))
    bg_prec = bg_prec_l.T @ bg_prec_l

    return MahalanobisFit(
        class_means=jnp.asarray(means, jnp.float32),
        prec=jnp.asarray(prec, jnp.float32),
        bg_mean=jnp.asarray(bg_mean, jnp.float32),
        bg_prec=jnp.asarray(bg_prec, jnp.float32),
    )


def save_fit(path: str, fit: MahalanobisFit) -> None:
    """Persist a fit next to its checkpoint (``maha_fit.npz``)."""
    np.savez(
        path,
        class_means=np.asarray(fit.class_means),
        prec=np.asarray(fit.prec),
        bg_mean=np.asarray(fit.bg_mean),
        bg_prec=np.asarray(fit.bg_prec),
        rmd_q50=np.float64(fit.rmd_q50),
        rmd_q99=np.float64(fit.rmd_q99),
    )


def load_fit(path: str) -> MahalanobisFit:
    with np.load(path) as z:
        return MahalanobisFit(
            class_means=jnp.asarray(z["class_means"], jnp.float32),
            prec=jnp.asarray(z["prec"], jnp.float32),
            bg_mean=jnp.asarray(z["bg_mean"], jnp.float32),
            bg_prec=jnp.asarray(z["bg_prec"], jnp.float32),
            rmd_q50=float(z["rmd_q50"]),
            rmd_q99=float(z["rmd_q99"]),
        )


def normalized_rmd(rmd: jax.Array, fit: MahalanobisFit) -> jax.Array:
    """Wire-scale feature distance: 0 ~ typical training frame, 1 ~ the
    99th percentile of training data, >1 = beyond the training manifold.
    Clipped below at 0 (closer-than-median is not a signal)."""
    span = max(fit.rmd_q99 - fit.rmd_q50, 1e-6)
    return jnp.maximum((rmd - fit.rmd_q50) / span, 0.0)


def mahalanobis_scores(features: jax.Array, fit: MahalanobisFit) -> dict:
    """Per-sample scores, higher = more anomalous (sweep extra-score shape).

    Returns ``{"maha": min_c MD_c, "rmd": min_c MD_c - MD_bg}`` in f32.
    One [B,C,D] einsum against program-constant matrices — negligible next
    to the forward's convs.
    """
    f = features.astype(jnp.float32)
    diff = f[:, None, :] - fit.class_means[None, :, :]  # [B, C, D]
    md = jnp.einsum("bcd,de,bce->bc", diff, fit.prec, diff)
    md_min = jnp.min(md, axis=-1)  # [B]
    bg_diff = f - fit.bg_mean[None, :]
    md_bg = jnp.einsum("bd,de,be->b", bg_diff, fit.bg_prec, bg_diff)
    return {"maha": md_min, "rmd": md_min - md_bg}
