"""DeepAugment-style views: distort images by passing them through the
shipped conv-autoencoder with randomly perturbed weights.

Why this exists (round-3 weather work): the 15x5 grid's weather family
(fog/snow/frost — structured low-frequency overlays + whitening,
fav_tpu/ops/corruptions.py:176-226) is the worst failure mode of every
shipped model (0.34-0.46 accuracy, BENCH.md), and the AugMix op set
(fav_tpu/ops/augment.py) contains nothing overlay-shaped *by leak-freedom
design*. DeepAugment (Hendrycks et al., "The Many Faces of Robustness",
ICCV 2021; PAPERS.md) is the standard leak-free answer: run images through
an image-to-image network whose weights are randomly perturbed — the
distortions come from the network's learned manifold, not from any
corruption formula, so the grid stays held out.

TPU shape: the perturbation is a pytree map (multiplicative Gaussian noise
+ random sign flips + random zeroing on conv kernels), the distorted view is
one AE forward — everything rides inside the training step's compiled
program; no host round-trips, no gathers.

The AE itself is the reference's anomaly-sensor architecture
(reference docs/system_notes.md:146-170) reused as an augmenter — its
reconstructions of the normal manifold are what get creatively broken.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["perturb_params", "deepaugment", "load_augmenter"]


def perturb_params(key: jax.Array, params: Any, strength: jax.Array) -> Any:
    """Randomly distort an image-to-image network's weights.

    Per leaf (independent keys): multiplicative noise ``w * (1 + s*eps)``
    with eps ~ N(0,1), sign flips with probability ``0.05*s`` and hard
    zeroing with probability ``0.05*s`` — the three distortion primitives of
    the DeepAugment recipe, applied as one fused elementwise pass per leaf.
    ``strength`` is traced, so one compiled step covers the whole severity
    range."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))

    def one(k, w):
        if not isinstance(w, jax.Array) or not jnp.issubdtype(w.dtype, jnp.floating):
            return w
        kn, ks, kz = jax.random.split(k, 3)
        noise = 1.0 + strength * jax.random.normal(kn, w.shape, jnp.float32)
        sign = jnp.where(
            jax.random.bernoulli(ks, 0.05 * strength, w.shape), -1.0, 1.0
        )
        keep = jnp.where(jax.random.bernoulli(kz, 0.05 * strength, w.shape), 0.0, 1.0)
        return (w.astype(jnp.float32) * noise * sign * keep).astype(w.dtype)

    return jax.tree_util.tree_unflatten(treedef, [one(k, w) for k, w in zip(keys, leaves)])


def deepaugment(
    key: jax.Array,
    images: jax.Array,
    ae_apply: Callable,
    ae_params: Any,
    max_strength: float = 0.45,
    min_blend: float = 0.35,
) -> jax.Array:
    """One DeepAugment view of a [B, H, W, C] batch in [0, 1].

    Draw a perturbation strength for the step, distort the AE's weights,
    reconstruct the batch through the broken AE, and Beta-style blend with
    the original per image (a fully broken AE view alone would destroy the
    label; the blend keeps semantics while importing the distortion
    statistics). Identity-safe: strength 0 + blend 0 returns the clean
    reconstruction manifold, never garbage."""
    k_s, k_p, k_b = jax.random.split(key, 3)
    strength = jax.random.uniform(k_s, (), jnp.float32, 0.1, max_strength)
    distorted = ae_apply(perturb_params(k_p, ae_params, strength), images)
    b = images.shape[0]
    lam = jax.random.uniform(k_b, (b, 1, 1, 1), jnp.float32, min_blend, 1.0)
    out = jnp.clip(
        (1.0 - lam) * images.astype(jnp.float32) + lam * distorted.astype(jnp.float32),
        0.0, 1.0,
    )
    return out.astype(images.dtype)


@functools.lru_cache(maxsize=1)
def load_augmenter(checkpoint_dir: str | None = None):
    """Load the shipped AE checkpoint as (apply_fn, params) for
    :func:`deepaugment`. Raises loudly if the checkpoint is missing — a
    silent identity augmenter would fake a robustness recipe."""
    import os

    from fav_tpu.models.cnn import create_autoencoder
    from fav_tpu.utils.checkpoint import DEFAULT_CKPT_DIR, restore_checkpoint

    ckpt = checkpoint_dir or os.path.join(DEFAULT_CKPT_DIR, "autoencoder")
    if not os.path.isdir(ckpt):
        raise FileNotFoundError(
            f"DeepAugment needs the autoencoder checkpoint at {ckpt} "
            "(train one with: python -m fav_tpu.models.pretrain --autoencoder)"
        )
    ae = create_autoencoder()
    template = ae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    params, _ = restore_checkpoint(ckpt, template)
    return ae.apply, params
