"""Backfill deploy-time conformal thresholds into shipped checkpoints.

Round 3 adds `conformal_qhat`/`conformal_alpha` to checkpoint metadata at
train time (fav_tpu/models/pretrain.py); this derives the same entries for
checkpoints trained before that, using the identical recipe: randomized APS
scores on the temperature-calibration split (test[:n//2]), alpha = 0.1.

Usage: python tools/backfill_conformal.py [ckpt_dir ...]   (default: all
classifier-family checkpoints under fav_tpu/checkpoints/)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def backfill(ckpt: str) -> dict | None:
    import jax
    import jax.numpy as jnp

    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.conformal import calibration_metadata
    from fav_tpu.models.uncertainty import init_ensemble
    from fav_tpu.utils.checkpoint import restore_checkpoint

    meta_path = os.path.join(ckpt, "metadata.json")
    with open(meta_path) as f:
        meta = json.load(f)
    if "conformal_qhat" in meta:
        print(f"{ckpt}: already has qhat {meta['conformal_qhat']}")
        return None
    if "ae_widths" in meta or meta.get("err_baseline") is not None:
        print(f"{ckpt}: autoencoder checkpoint, no label space - skipped")
        return None

    mp = ModelParams()
    overrides = {
        k: meta[k]
        for k in ("arch", "dense_width", "vit_dim", "vit_depth", "vit_heads")
        if meta.get(k) is not None
    }
    if meta.get("widths"):
        overrides["widths"] = tuple(meta["widths"])
    mp = dataclasses.replace(mp, **overrides)
    model = create_model(mp)
    sample = jnp.zeros((1, mp.image_size, mp.image_size, mp.channels))
    size = meta.get("ensemble_size")
    if size:
        params = init_ensemble(model, jax.random.PRNGKey(0), sample, int(size))
        fwd = lambda p, x: jnp.mean(jax.vmap(lambda q: model.apply(q, x))(p), axis=0)  # noqa: E731
    else:
        params = model.init(jax.random.PRNGKey(0), sample)
        fwd = model.apply
    params, meta_restored = restore_checkpoint(ckpt, params)
    t = float(meta_restored.get("temperature", 1.0))

    ds = load_cifar10()
    n_val = ds.test_images.shape[0] // 2
    val_x = jnp.asarray(ds.test_images[:n_val])
    val_y = jnp.asarray(ds.test_labels[:n_val])
    probs = jax.nn.softmax(jax.jit(fwd)(params, val_x) / t, axis=-1)
    entries = calibration_metadata(probs, val_y)
    meta.update(entries)
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
    print(f"{ckpt}: {entries}")
    return entries


if __name__ == "__main__":
    targets = sys.argv[1:]
    if not targets:
        base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "fav_tpu", "checkpoints")
        targets = [
            os.path.join(base, d) for d in sorted(os.listdir(base))
            if os.path.isfile(os.path.join(base, d, "metadata.json"))
        ]
    for ckpt in targets:
        try:
            backfill(ckpt)
        except Exception as e:
            print(f"{ckpt}: FAILED {type(e).__name__}: {e}")
