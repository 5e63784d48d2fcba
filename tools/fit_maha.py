"""Fit the feature-space Mahalanobis Gaussians for a checkpoint and write
``maha_fit.npz`` next to its metadata.json.

Once the fit file exists, the serving InferenceService streams a per-frame
``feature_distance`` (normalized relative Mahalanobis: 0 ~ typical training
frame, 1 ~ the 99th percentile of training data) on the websocket next to
confidence / entropy / conformal set size — a label-free "how far outside
the training manifold is this frame" reading, the feature-space complement
of the logit-space signals (fav_tpu/models/mahalanobis.py).

Usage: python tools/fit_maha.py --checkpoint fav_tpu/checkpoints/student_nano
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--fit-images", type=int, default=10240)
    ap.add_argument("--out", default=None,
                    help="output npz path (default: <checkpoint>/maha_fit.npz)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.mahalanobis import (
        FIT_FILENAME,
        collect_features,
        fit_feature_gaussians,
        mahalanobis_scores,
        save_fit,
    )
    from fav_tpu.utils.checkpoint import restore_checkpoint

    meta_path = os.path.join(args.checkpoint, "metadata.json")
    if not os.path.isfile(meta_path):
        ap.error(f"no checkpoint at {args.checkpoint}")
    with open(meta_path) as f:
        meta = json.load(f)
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
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    variables, _ = restore_checkpoint(args.checkpoint, variables)

    ds = load_cifar10()
    n = min(args.fit_images, ds.train_images.shape[0])
    feats = collect_features(model, variables, jnp.asarray(ds.train_images[:n]))
    # the Gaussians fit on the first 90%; the wire-scale quantiles ("1.0 =
    # 99th percentile of training data") come from the held-out last 10% —
    # in-sample quantiles are optimistic for exactly the tail the scale
    # anchors (ADVICE r3)
    n_fit = max(1, int(n * 0.9)) if n >= 10 else n
    fit = fit_feature_gaussians(feats[:n_fit], ds.train_labels[:n_fit], mp.num_classes)
    rmd = np.asarray(
        mahalanobis_scores(jnp.asarray(feats[n_fit:] if n_fit < n else feats), fit)["rmd"],
        np.float64,
    )
    fit = dataclasses.replace(
        fit,
        rmd_q50=float(np.quantile(rmd, 0.50)),
        rmd_q99=float(np.quantile(rmd, 0.99)),
    )
    out = args.out or os.path.join(args.checkpoint, FIT_FILENAME)
    save_fit(out, fit)
    print(json.dumps({
        "checkpoint": args.checkpoint,
        "fit_images": n,
        "feature_dim": int(feats.shape[1]),
        "rmd_q50": round(fit.rmd_q50, 3),
        "rmd_q99": round(fit.rmd_q99, 3),
        "out": out,
        "data_source": ds.source,
    }, indent=2))


if __name__ == "__main__":
    main()
