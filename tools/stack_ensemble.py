"""Stack independently trained same-architecture checkpoints into one
ensemble-format checkpoint (a *heterogeneous-recipe* ensemble).

The shipped 5-member ensemble is plain bagging: same recipe, different
seeds. The three full-width classifiers shipped this round were trained
with three *different* augmentation recipes (plain AugMix / +freqband /
+occlude) — diverse-recipe members make diverse errors, which is exactly
what logit averaging monetizes (the round-3 finding that AugMix-training
an ensemble *correlates* members and loses the bagging gain is the same
coin, flipped). This tool stacks such checkpoints leaf-wise into the
``(M, ...)`` layout `init_ensemble` produces, fits a temperature + a
deploy-time conformal threshold on the logit-averaged forward (same
held-out split and recipe as pretrain), and writes a checkpoint that
`evaluate --ensemble M --checkpoint DIR` and the serving path consume
unchanged.

Usage:
  python tools/stack_ensemble.py --out fav_tpu/checkpoints/ensemble_recipes \
      fav_tpu/checkpoints/classifier fav_tpu/checkpoints/classifier_freq \
      fav_tpu/checkpoints/classifier_occl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("members", nargs="+", help="checkpoint dirs to stack")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    if len(args.members) < 2:
        ap.error("need at least 2 member checkpoints")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.models.calibration import (
        auroc,
        expected_calibration_error,
        failure_labels,
        fit_temperature,
    )
    from fav_tpu.models.conformal import calibration_metadata
    from fav_tpu.models.cnn import create_model
    from fav_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    metas = []
    for m in args.members:
        with open(os.path.join(m, "metadata.json")) as f:
            metas.append(json.load(f))
    arch_key = [(m.get("arch"), tuple(m.get("widths") or ()), m.get("dense_width"))
                for m in metas]
    if len(set(arch_key)) != 1:
        raise SystemExit(f"members disagree on architecture: {arch_key}")
    arch, widths, dense_width = arch_key[0]

    mp = ModelParams(arch=arch, widths=widths or ModelParams().widths,
                     dense_width=dense_width or ModelParams().dense_width)
    model = create_model(mp)
    ds = load_cifar10()
    sample = jnp.zeros((1,) + ds.test_images.shape[1:], jnp.float32)
    template = model.init(jax.random.PRNGKey(0), sample)

    members = []
    for m in args.members:
        params, _ = restore_checkpoint(m, template)
        members.append(params)
    stacked = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *members)

    def eval_logits(x):
        return jnp.mean(jax.vmap(lambda p: model.apply(p, x))(stacked), axis=0)

    n_val = ds.test_images.shape[0] // 2
    val_x, val_y = jnp.asarray(ds.test_images[:n_val]), jnp.asarray(ds.test_labels[:n_val])
    test_x, test_y = jnp.asarray(ds.test_images[n_val:]), jnp.asarray(ds.test_labels[n_val:])
    val_logits = eval_logits(val_x)
    logits = eval_logits(test_x)
    temperature = float(fit_temperature(val_logits, val_y))
    probs = jax.nn.softmax(logits / temperature, axis=-1)
    conf = jnp.max(probs, axis=-1)
    preds = jnp.argmax(probs, axis=-1)
    correct = (preds == test_y).astype(jnp.float32)
    fails = failure_labels(preds, test_y)
    metadata = {
        "accuracy": round(float(jnp.mean(correct)), 4),
        "temperature": round(temperature, 4),
        **calibration_metadata(jax.nn.softmax(val_logits / temperature, -1), val_y),
        "ece": round(float(expected_calibration_error(conf, correct)), 4),
        "failure_auroc": (
            round(float(auroc(1.0 - conf, fails)), 4) if int(fails.sum()) > 0 else None
        ),
        "data_source": ds.source,
        "ensemble_size": len(members),
        "stacked_from": [os.path.normpath(m) for m in args.members],
        "member_recipes": [
            {k: mm[k] for k in ("augmix", "freqband", "occlude", "train_steps")
             if k in mm}
            for mm in metas
        ],
        "arch": mp.arch,
        "widths": list(mp.widths),
        "dense_width": mp.dense_width,
    }
    print(json.dumps(metadata, indent=2))
    save_checkpoint(args.out, stacked, metadata=metadata)
    print(f"checkpoint -> {args.out}")
    return metadata


if __name__ == "__main__":
    main()
