"""Compact Vision Transformer — the third classifier family.

The reference scopes its ML to a small CNN/AE (SURVEY.md §2.4); this family
goes past parity in two ways:

* **capability** — a transformer rides every existing harness unchanged
  (train step, MC-dropout, deep ensembles, temperature scaling, corruption
  sweeps, serving), selected with ``arch='vit'``;
* **parallelism** — it makes the mesh's reserved ``model`` axis real:
  attention heads and the MLP hidden dimension shard over it
  (:func:`tp_shard_vit_params`), the canonical Megatron-style tensor-parallel
  layout where the only cross-device communication is the psum XLA emits
  after the row-parallel projections.

TPU design notes (same rules as :mod:`fav_tpu.models.cnn`):

* bfloat16 compute / float32 params and logits,
* static shapes throughout: 32x32 -> 8x8 patches -> 64 tokens + CLS,
* dropout takes an explicit rng so MC-dropout stays a pure ``vmap``,
* head count divides the default mesh ``model``-axis sizes (1/2/4).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["VisionTransformer", "tp_shard_vit_params"]


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


class _Block(nn.Module):
    dim: int
    heads: int
    mlp_dim: int
    dropout_rate: float
    compute_dtype: str

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = _dtype(self.compute_dtype)
        h = nn.LayerNorm(dtype=dt)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            dtype=dt,
            dropout_rate=self.dropout_rate,
            deterministic=not train,
        )(h, h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        x = x + h
        h = nn.LayerNorm(dtype=dt)(x)
        h = nn.Dense(self.mlp_dim, dtype=dt, name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=dt, name="mlp_out")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return x + h


class VisionTransformer(nn.Module):
    """ViT for 32x32 inputs: patchify (conv stride=patch) -> CLS token ->
    transformer blocks -> LayerNorm -> float32 logits head."""

    num_classes: int = 10
    patch: int = 4
    dim: int = 128
    depth: int = 4
    heads: int = 4
    mlp_dim: int = 256
    dropout_rate: float = 0.1
    compute_dtype: str = "bfloat16"
    standardize_input: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        dt = _dtype(self.compute_dtype)
        if self.standardize_input:
            from fav_tpu.models.cnn import standardize_image

            x = standardize_image(x)
        b = x.shape[0]
        h = nn.Conv(
            self.dim, (self.patch, self.patch), strides=(self.patch, self.patch),
            padding="VALID", dtype=dt, name="patchify",
        )(x.astype(dt))
        h = h.reshape(b, -1, self.dim)  # [B, tokens, dim]
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.dim), jnp.float32)
        h = jnp.concatenate([jnp.broadcast_to(cls.astype(dt), (b, 1, self.dim)), h], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, h.shape[1], self.dim), jnp.float32
        )
        h = h + pos.astype(dt)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        for i in range(self.depth):
            h = _Block(
                self.dim, self.heads, self.mlp_dim, self.dropout_rate,
                self.compute_dtype, name=f"block_{i}",
            )(h, train=train)
        h = nn.LayerNorm(dtype=dt)(h)
        feats = h[:, 0]
        # penultimate (CLS-token) features for feature-space failure scores
        # (models/mahalanobis.py); no-op unless 'intermediates' is mutable
        self.sow("intermediates", "features", feats)
        # logits in float32: softmax/temperature math needs the precision
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(feats)


def tp_shard_vit_params(mesh, params):
    """Place ViT params tensor-parallel over the mesh's ``model`` axis.

    Megatron layout: the attention q/k/v projections and the MLP input
    projection are column-parallel (output/head dim sharded), the attention
    output projection and MLP output projection are row-parallel (input dim
    sharded); everything else (embeddings, LayerNorms, head) replicates.
    Under ``jit`` XLA then emits exactly one psum per block half — the
    communication pattern the ``model`` axis was reserved for (SURVEY.md
    §2.5 "mesh axis reserved ... so larger backbones can shard without API
    change").
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_for(path, leaf):
        # flax paths: block_i/MultiHeadDotProductAttention_0/{query,key,value,
        # out}/kernel and block_i/{mlp_in,mlp_out}/kernel
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        parent = names[-2] if len(names) >= 2 else ""
        if names[-1] == "kernel" and leaf.ndim == 3:
            if parent in ("query", "key", "value"):
                # [dim, heads, head_dim]: shard heads (column-parallel)
                return P(None, "model", None)
            if parent == "out":
                # [heads, head_dim, dim]: shard heads (row-parallel)
                return P("model", None, None)
        if names[-1] == "kernel" and parent == "mlp_in":
            return P(None, "model")  # column-parallel: hidden out dim
        if names[-1] == "kernel" and parent == "mlp_out":
            return P("model", None)  # row-parallel: hidden in dim
        return P()  # replicate (biases, norms, embeddings, head)

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, NamedSharding(mesh, spec_for(path, leaf))),
        params,
    )
