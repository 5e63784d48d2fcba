"""Flax models: the failure-aware CNN classifier and the conv autoencoder.

The reference's ML component is an *absent* PyTorch conv-AE trained on normal
frames, with reconstruction MSE as the anomaly signal (reference
docs/system_notes.md:146-198; proxied in-repo by
platform/backend/anomaly_simulator.py). The TPU build provides both:

* :class:`FailureAwareCNN` — a VGG-style CIFAR-10 classifier whose softmax
  confidence drives the failure detector ("failure = incorrect prediction
  with high confidence", reference README.md:22-24),
* :class:`ConvAutoencoder` — a strided conv encoder/decoder whose
  reconstruction error reproduces the reference's anomaly-as-reconstruction
  design, including its documented BLANK blind spot (an AE trained on lit
  frames reconstructs black frames easily — anomaly stays LOW,
  reference anomaly_simulator.py:65-70).

TPU design notes:

* compute in **bfloat16** (MXU-native), params + logits in float32,
* all spatial dims stay powers of two (32 -> 16 -> 8 -> 4) so XLA tiles convs
  onto the MXU without padding waste,
* dropout is expressed with an explicit rng so MC-dropout is a pure
  ``vmap`` over keys (no global RNG state),
* no data-dependent Python control flow — the whole forward is one traced
  graph.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from fav_tpu.config import ModelParams

__all__ = [
    "FailureAwareCNN",
    "ResNetSmall",
    "ConvAutoencoder",
    "create_model",
    "create_autoencoder",
]


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


def standardize_image(x: jax.Array) -> jax.Array:
    """Per-image standardization: ``(x - mean) / max(std, 1e-3)`` over
    (H, W, C), computed in float32 before the bfloat16 cast.

    Mechanism (round-4 snow pre-registration, measurements/r4/snow_prereg.md):
    the weather grid cells apply *affine luminance veils* — snow's base is
    ``blend*x + (1-blend)*whitened`` (ops/corruptions.py:202), contrast is
    ``(x-m)*c + m``, brightness ``x + c``, fog an additive plume — and a
    forward that standardizes its input is invariant to every affine map the
    clip didn't destroy, by construction. Measured before retraining: the
    deployed student recovers snow-sev5 0.113 -> 0.279 with this applied
    test-time-only. Leak-freedom: this is an architecture property (input
    normalization, classic CIFAR practice), not a training augmentation; no
    corruption formula is used.
    """
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(-3, -2, -1), keepdims=True)
    s = jnp.std(xf, axis=(-3, -2, -1), keepdims=True)
    return (xf - m) / jnp.maximum(s, 1e-3)


class FailureAwareCNN(nn.Module):
    """VGG-style CNN: N stages of [conv-GN-relu x2, stride-2 conv], then GAP
    and a dense head. GroupNorm (not BatchNorm) keeps the forward pure — no
    mutable batch stats to thread through vmap/pjit, and per-example
    normalization is what a single-frame streaming service needs anyway.
    """

    num_classes: int = 10
    widths: Sequence[int] = (64, 128, 256)
    dense_width: int = 256
    dropout_rate: float = 0.1
    compute_dtype: str = "bfloat16"
    standardize_input: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        dt = _dtype(self.compute_dtype)
        if self.standardize_input:
            x = standardize_image(x)
        x = x.astype(dt)
        for width in self.widths:
            for _ in range(2):
                x = nn.Conv(width, (3, 3), padding="SAME", dtype=dt)(x)
                x = nn.GroupNorm(num_groups=min(32, width), dtype=dt)(x)
                x = nn.relu(x)
            # strided conv downsample (cheaper than pool+conv on MXU)
            x = nn.Conv(width, (3, 3), strides=(2, 2), padding="SAME", dtype=dt)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = jnp.mean(x, axis=(-3, -2))  # global average pool
        x = nn.Dense(self.dense_width, dtype=dt)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        # penultimate features for feature-space failure scores (Mahalanobis,
        # models/mahalanobis.py); sow is a no-op unless the caller marks
        # 'intermediates' mutable, and flax init() denies the collection, so
        # params/checkpoints/serving are unchanged
        self.sow("intermediates", "features", x)
        # logits in float32: softmax/temperature math needs the precision
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


class ResidualBlock(nn.Module):
    """Pre-activation residual block (GN -> relu -> conv x2 + skip)."""

    width: int
    strides: tuple = (1, 1)
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = _dtype(self.compute_dtype)
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), dtype=dt)(x)
        h = nn.relu(h)
        skip = x
        if self.strides != (1, 1) or x.shape[-1] != self.width:
            skip = nn.Conv(self.width, (1, 1), strides=self.strides, dtype=dt)(h)
        h = nn.Conv(self.width, (3, 3), strides=self.strides, padding="SAME", dtype=dt)(h)
        h = nn.GroupNorm(num_groups=min(32, self.width), dtype=dt)(h)
        h = nn.relu(h)
        h = nn.Conv(self.width, (3, 3), padding="SAME", dtype=dt)(h)
        return skip + h


class ResNetSmall(nn.Module):
    """Second model family: pre-activation ResNet for 32x32 inputs.

    Same serving/uncertainty/training surface as :class:`FailureAwareCNN`
    (apply(params, x, train=, rngs=) -> float32 logits), so every harness —
    MC-dropout, ensembles, sweeps, the micro-batched server — works on it
    unchanged. Select with ``ModelParams(arch='resnet')``.
    """

    num_classes: int = 10
    widths: Sequence[int] = (64, 128, 256)
    blocks_per_stage: int = 2
    dropout_rate: float = 0.1
    compute_dtype: str = "bfloat16"
    standardize_input: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        dt = _dtype(self.compute_dtype)
        if self.standardize_input:
            x = standardize_image(x)
        h = nn.Conv(self.widths[0], (3, 3), padding="SAME", dtype=dt)(x.astype(dt))
        for stage, width in enumerate(self.widths):
            for block in range(self.blocks_per_stage):
                strides = (2, 2) if (stage > 0 and block == 0) else (1, 1)
                h = ResidualBlock(width, strides, self.compute_dtype)(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.GroupNorm(num_groups=min(32, self.widths[-1]), dtype=dt)(h)
        h = nn.relu(h)
        h = jnp.mean(h, axis=(-3, -2))
        # penultimate (post-GAP) features — see FailureAwareCNN's sow note
        self.sow("intermediates", "features", h)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(h)


class ConvAutoencoder(nn.Module):
    """Strided conv AE, 32x32x3 -> 4x4xlatent -> 32x32x3.

    Trained on *normal* frames only; per-image reconstruction MSE is the
    anomaly score (reference docs/system_notes.md:146-170). Output passes
    through a sigmoid so targets in [0,1] are matched at the codomain.
    """

    widths: Sequence[int] = (32, 64, 128)
    latent: int = 128
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = _dtype(self.compute_dtype)
        h = x.astype(dt)
        for width in self.widths:
            h = nn.Conv(width, (3, 3), strides=(2, 2), padding="SAME", dtype=dt)(h)
            h = nn.relu(h)
        h = nn.Conv(self.latent, (3, 3), padding="SAME", dtype=dt)(h)
        h = nn.relu(h)
        for width in reversed(self.widths):
            h = nn.ConvTranspose(width, (3, 3), strides=(2, 2), padding="SAME", dtype=dt)(h)
            h = nn.relu(h)
        h = nn.Conv(x.shape[-1], (3, 3), padding="SAME", dtype=jnp.float32)(h)
        return nn.sigmoid(h)

    @staticmethod
    def reconstruction_error(recon: jax.Array, x: jax.Array) -> jax.Array:
        """Per-image MSE — the reference's anomaly scalar
        (anomaly_simulator.py:1-9 proxies exactly this)."""
        return jnp.mean((recon - x.astype(recon.dtype)) ** 2, axis=(-3, -2, -1))


def create_model(params: ModelParams | None = None):
    p = params or ModelParams()
    if p.arch == "vit":
        from fav_tpu.models.vit import VisionTransformer

        return VisionTransformer(
            num_classes=p.num_classes,
            dim=p.vit_dim,
            depth=p.vit_depth,
            heads=p.vit_heads,
            mlp_dim=2 * p.vit_dim,
            dropout_rate=p.dropout_rate,
            compute_dtype=p.compute_dtype,
            standardize_input=p.standardize_input,
        )
    if p.arch == "resnet":
        return ResNetSmall(
            num_classes=p.num_classes,
            widths=tuple(p.widths),
            dropout_rate=p.dropout_rate,
            compute_dtype=p.compute_dtype,
            standardize_input=p.standardize_input,
        )
    return FailureAwareCNN(
        num_classes=p.num_classes,
        widths=tuple(p.widths),
        dense_width=p.dense_width,
        dropout_rate=p.dropout_rate,
        compute_dtype=p.compute_dtype,
        standardize_input=p.standardize_input,
    )


def create_autoencoder(params: ModelParams | None = None) -> ConvAutoencoder:
    p = params or ModelParams()
    return ConvAutoencoder(compute_dtype=p.compute_dtype)
