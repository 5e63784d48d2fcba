"""Shift-aware temperature refitting.

BENCH.md "Calibration under shift" measured that the CLEAN-fit temperature
(Guo et al. 2017, fit on held-out clean NLL) does not survive corruption
for single classifiers: grid-mean ECE climbs 0.05 -> 0.19 by severity 5 and
the model is confidently wrong exactly where the reference ODD forbids it
(failure = high-confidence wrong prediction, /root/reference/README.md:22-24).
Mechanism: under shift accuracy drops but logit magnitudes do not, so the
one scalar fit to clean data under-smooths.

This tool refits T on a leak-free proxy for shift: the same held-out val
split PLUS K AugMix views of it (op pool disjoint from the 15 test
corruptions, fav_tpu/ops/augment.py — optionally widened with the spectral
/ occlusion ops). Augmented views have lower accuracy at similar logit
scale, so the NLL-optimal T rises toward what the corrupted grid needs
without ever seeing a test corruption. Expectation management: for
AugMix-TRAINED checkpoints the views are near their training manifold, so
the shift in T is small; the interesting subjects are the plain-CE
classifier and the occlusion-trained accuracy champions whose snow-sev5
confidence hole is documented in BENCH.md.

By default this only REPORTS the clean-fit vs shift-fit temperature and
their ECEs on clean + augmented val. With ``--out DIR`` it writes a full
copy of the checkpoint with ``temperature`` replaced (the clean-fit value
is preserved as ``temperature_cleanfit``), so ``evaluate --checkpoint DIR``
and serving pick the refit up unchanged and the shipped checkpoint stays
untouched.

Usage:
  python tools/refit_temperature.py --checkpoint fav_tpu/checkpoints/classifier \
      [--views 7] [--occlude] [--freqband] [--out measurements/r3/classifier_shiftT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--views", type=int, default=7,
                    help="number of AugMix views of the val split to add "
                         "next to the clean copy when fitting T")
    ap.add_argument("--occlude", action="store_true",
                    help="add the rectangular occlusion op to the view pool")
    ap.add_argument("--freqband", action="store_true",
                    help="add the spectral band-gain op to the view pool")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--out", type=str, default=None,
                    help="write a checkpoint copy with the refit temperature")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.models.calibration import (
        expected_calibration_error,
        fit_temperature,
    )
    from fav_tpu.models.cnn import create_model
    from fav_tpu.ops.augment import augmix
    from fav_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    with open(os.path.join(args.checkpoint, "metadata.json")) as f:
        meta = json.load(f)
    if meta.get("ensemble_size"):
        raise SystemExit("single-model checkpoints only (temperature rides "
                         "the logit-averaged forward for ensembles — refit "
                         "at stack time instead, tools/stack_ensemble.py)")
    mp = ModelParams(
        arch=meta.get("arch", "vgg"),
        widths=tuple(meta.get("widths") or ModelParams().widths),
        dense_width=meta.get("dense_width") or ModelParams().dense_width,
    )
    model = create_model(mp)
    ds = load_cifar10()
    sample = jnp.zeros((1,) + ds.test_images.shape[1:], jnp.float32)
    template = model.init(jax.random.PRNGKey(0), sample)
    params, _ = restore_checkpoint(args.checkpoint, template)

    # same held-out split convention as pretrain/stack_ensemble
    n_val = ds.test_images.shape[0] // 2
    val_x = jnp.asarray(ds.test_images[:n_val])
    val_y = jnp.asarray(ds.test_labels[:n_val])

    fwd = jax.jit(model.apply)
    key = jax.random.PRNGKey(args.seed)
    view_fn = jax.jit(lambda k, x: augmix(
        k, x, freq=args.freqband, occlude=args.occlude))
    xs = [val_x] + [view_fn(jax.random.fold_in(key, i), val_x)
                    for i in range(args.views)]
    logit_sets = [fwd(params, x) for x in xs]
    all_logits = jnp.concatenate(logit_sets, axis=0)
    all_y = jnp.tile(val_y, len(xs))

    t_clean = float(fit_temperature(logit_sets[0], val_y))
    t_shift = float(fit_temperature(all_logits, all_y))

    def ece_at(logits, y, t):
        probs = jax.nn.softmax(logits / t, axis=-1)
        conf = jnp.max(probs, axis=-1)
        correct = (jnp.argmax(probs, -1) == y).astype(jnp.float32)
        return float(expected_calibration_error(conf, correct))

    aug_logits = jnp.concatenate(logit_sets[1:], axis=0)
    aug_y = jnp.tile(val_y, len(xs) - 1)
    aug_acc = float(jnp.mean(
        (jnp.argmax(aug_logits, -1) == aug_y).astype(jnp.float32)))
    report = {
        "checkpoint": os.path.normpath(args.checkpoint),
        "views": args.views,
        "view_pool": {"freqband": args.freqband, "occlude": args.occlude},
        "temperature_cleanfit": round(t_clean, 4),
        "temperature_shiftfit": round(t_shift, 4),
        "val_acc_augmented_views": round(aug_acc, 4),
        "ece_clean_val": {
            "cleanfit_T": round(ece_at(logit_sets[0], val_y, t_clean), 4),
            "shiftfit_T": round(ece_at(logit_sets[0], val_y, t_shift), 4),
        },
        "ece_augmented_val": {
            "cleanfit_T": round(ece_at(aug_logits, aug_y, t_clean), 4),
            "shiftfit_T": round(ece_at(aug_logits, aug_y, t_shift), 4),
        },
    }
    print(json.dumps(report, indent=2))

    if args.out:
        new_meta = dict(meta)
        new_meta["temperature"] = round(t_shift, 4)
        new_meta["temperature_cleanfit"] = round(t_clean, 4)
        new_meta["temperature_refit"] = {
            "views": args.views, "freqband": args.freqband,
            "occlude": args.occlude, "seed": args.seed,
        }
        new_meta.pop("format", None)
        save_checkpoint(args.out, params, metadata=new_meta)
        print(f"checkpoint -> {args.out}")
    return report


if __name__ == "__main__":
    main()
