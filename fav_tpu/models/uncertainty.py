"""Uncertainty machinery: MSP, predictive entropy, MC-dropout, deep ensembles.

The reference bounds ML influence to a scalar anomaly signal
(reference docs/system_notes.md:173-198); its failure definition is "incorrect
prediction with high confidence" (reference README.md:22-24). This module
produces the confidence/uncertainty scalars that feed the trust engine's
anomaly input, each as a pure jit/vmap-native function:

* **MSP** — max softmax probability (the classic failure-detection baseline),
* **predictive entropy** — full-distribution uncertainty,
* **MC-dropout** — K stochastic forward passes, expressed as ``vmap`` over
  dropout keys: one compiled program evaluates all replicas; on a mesh the
  replica axis shards over devices,
* **deep ensembles** — M members as a stacked-params leading axis, evaluated
  with ``vmap`` over the parameter pytree (ensemble parallelism: the member
  axis maps onto mesh devices with no code change).

All functions take logits or apply-fns; nothing here owns state.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = [
    "max_softmax_probability",
    "energy_score",
    "predictive_entropy",
    "mutual_information",
    "mc_dropout_predict",
    "ensemble_predict",
    "init_ensemble",
    "anomaly_from_confidence",
]


def max_softmax_probability(logits: jax.Array, temperature: float | jax.Array = 1.0) -> jax.Array:
    """MSP confidence in [1/C, 1]. Higher = more confident."""
    return jnp.max(jax.nn.softmax(logits / temperature, axis=-1), axis=-1)


def energy_score(logits: jax.Array, temperature: float | jax.Array = 1.0) -> jax.Array:
    """Energy-based failure/OOD score (Liu et al., NeurIPS 2020):
    ``E(x) = -T * logsumexp(logits / T)``. HIGHER energy = less total
    evidence = more failure-prone. Unlike MSP, energy keeps the logit
    *magnitude* information the softmax normalizes away — a saturated
    softmax can be confidently wrong while its logits are uniformly small;
    energy still flags it. Reported per grid cell as ``auroc_energy``
    (fav_tpu/parallel/sweep.py) next to the MSP-based ``auroc``."""
    t = jnp.asarray(temperature, jnp.float32)
    return -t * jax.nn.logsumexp(logits.astype(jnp.float32) / t, axis=-1)


def predictive_entropy(probs: jax.Array) -> jax.Array:
    """Shannon entropy (nats) of a categorical distribution, safe at p=0."""
    logp = jnp.log(jnp.where(probs > 0, probs, 1.0))
    return -jnp.sum(probs * logp, axis=-1)


def mutual_information(member_probs: jax.Array) -> jax.Array:
    """BALD mutual information over a replica axis 0: H[E p] - E H[p].

    Captures *epistemic* (model) uncertainty — high when replicas disagree.
    """
    mean_probs = jnp.mean(member_probs, axis=0)
    return predictive_entropy(mean_probs) - jnp.mean(predictive_entropy(member_probs), axis=0)


def mc_dropout_predict(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    images: jax.Array,
    key: jax.Array,
    num_samples: int = 20,
    temperature: float | jax.Array = 1.0,
) -> dict[str, jax.Array]:
    """K stochastic forward passes with dropout active, vmapped over keys.

    One XLA program computes all K replicas; the replica axis is a normal
    batch-like axis that shards over a mesh ensemble axis if requested.
    Returns mean probs + MSP / entropy / mutual-information scalars.
    """
    keys = jax.random.split(key, num_samples)

    def one(k):
        logits = apply_fn(params, images, train=True, rngs={"dropout": k})
        return jax.nn.softmax(logits / temperature, axis=-1)

    member_probs = jax.vmap(one)(keys)  # [K, B, C]
    return _summarize(member_probs)


def ensemble_predict(
    apply_fn: Callable[..., jax.Array],
    stacked_params: Any,
    images: jax.Array,
    temperature: float | jax.Array = 1.0,
) -> dict[str, jax.Array]:
    """Deep-ensemble forward: vmap over the stacked-params leading axis.

    ``stacked_params`` is a pytree whose leaves carry a leading member axis
    (built by :func:`init_ensemble`). Sharding that axis over the mesh's
    ensemble dimension gives member-per-device execution with zero
    communication until the final mean — the TPU-native replacement for the
    reference's absent multi-model serving (SURVEY.md §2.5).
    """

    def one(p):
        return jax.nn.softmax(apply_fn(p, images) / temperature, axis=-1)

    member_probs = jax.vmap(one)(stacked_params)  # [M, B, C]
    return _summarize(member_probs)


def _summarize(member_probs: jax.Array) -> dict[str, jax.Array]:
    mean_probs = jnp.mean(member_probs, axis=0)
    return {
        "probs": mean_probs,
        "member_probs": member_probs,
        "confidence": jnp.max(mean_probs, axis=-1),
        "prediction": jnp.argmax(mean_probs, axis=-1),
        "entropy": predictive_entropy(mean_probs),
        "mutual_information": mutual_information(member_probs),
    }


def init_ensemble(model, key: jax.Array, sample_input: jax.Array, size: int) -> Any:
    """Initialize M independent members and stack their params leaf-wise.

    The result's leaves have shape ``(M, ...)`` — ready for
    :func:`ensemble_predict` and for sharding the member axis over a mesh.
    """
    keys = jax.random.split(key, size)
    return jax.vmap(lambda k: model.init(k, sample_input))(keys)


def anomaly_from_confidence(
    confidence: jax.Array,
    allowed_floor: float = 0.6,
    scale: float = 2.5,
) -> jax.Array:
    """Map classifier confidence to the trust engine's anomaly scalar in [0,1].

    The reference's anomaly is a small baseline (~0.019) that grows with
    degradation (anomaly_simulator.py:22-24,49-77). Confidence above
    ``allowed_floor`` maps near zero; confidence collapse toward chance maps
    toward 1. Monotone, bounded — honors the "ML as bounded signal" invariant
    (reference platform/README.md:58-64).
    """
    deficit = jnp.maximum(0.0, allowed_floor - confidence) / allowed_floor
    return jnp.clip(deficit * scale, 0.0, 1.0)
