"""Train + calibrate the serving classifier and save its checkpoint.

Usage: ``python -m fav_tpu.models.pretrain [--steps N] [--out DIR]``

Pipeline (the ML strategy the reference documents but cannot ship,
reference docs/system_notes.md:146-198): train the CNN on CIFAR-10 (real
batches if present, deterministic synthetic otherwise), fit the temperature
scalar on a held-out split (Guo et al. 2017), evaluate accuracy / ECE /
failure-detection AUROC, and write an orbax/npz checkpoint the serving
InferenceService loads at boot.
"""

from __future__ import annotations

import argparse
import json
import os


def _train_ensemble(model, ds, args):
    """Train N independent members in one vmapped program (the ensemble
    train step; members differ by init and dropout keys).

    With ``--shard`` and a multi-device host, members shard over the mesh's
    ensemble axis (member-per-device when sizes divide — the same layout
    ``__graft_entry__.dryrun_multichip`` validates) and the batch over the
    data axis; XLA emits the ICI collectives. The jitted step is unchanged.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from fav_tpu.data.cifar import index_iterator
    from fav_tpu.models.train import (
        TrainState,
        make_ensemble_megastep,
        make_ensemble_train_step,
    )
    from fav_tpu.models.uncertainty import init_ensemble

    sample = jnp.zeros((1,) + ds.train_images.shape[1:], jnp.float32)
    stacked = init_ensemble(model, jax.random.PRNGKey(args.seed), sample, args.ensemble)
    tx = optax.adamw(args.lr)
    states = TrainState(
        stacked, jax.vmap(tx.init)(stacked), jnp.zeros((args.ensemble,), jnp.int32)
    )

    place_batch = place_data = jnp.asarray
    if getattr(args, "shard", False) and jax.device_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fav_tpu.parallel.mesh import auto_mesh_shape, build_mesh

        mesh = build_mesh(auto_mesh_shape(jax.device_count(), args.ensemble))
        print(f"sharded ensemble training over mesh {dict(mesh.shape)}")

        def ens_spec(leaf):
            return NamedSharding(mesh, P("ensemble", *([None] * (leaf.ndim - 1))))

        states = jax.tree.map(lambda leaf: jax.device_put(leaf, ens_spec(leaf)), states)
        data_sh = NamedSharding(mesh, P("data", *([None] * 3)))
        lbl_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())

        def place_batch(a):  # noqa: F811 — sharded variant
            a = jnp.asarray(a)
            return jax.device_put(a, data_sh if a.ndim == 4 else lbl_sh)

        def place_data(a):  # noqa: F811 — resident set is replicated
            return jax.device_put(jnp.asarray(a), repl)

    aug_kwargs = dict(
        augmix=getattr(args, "augmix", False) or getattr(args, "augmix_ce", False),
        js_lam=getattr(args, "js_lam", 12.0),
        augmix_mode="ce" if getattr(args, "augmix_ce", False) else "js",
    )
    # both paths draw batches from ONE index stream (and one split of the
    # chain key per step), so per-step and megastep trajectories match
    idx_it = index_iterator(ds.train_images.shape[0], args.batch, seed=args.seed)
    key = jax.random.PRNGKey(args.seed + 1)
    steps_done = 0
    megastep = getattr(args, "megastep", 0)
    if megastep > 0:
        import numpy as np

        mega = make_ensemble_megastep(model.apply, tx, **aug_kwargs)
        images_all = place_data(ds.train_images)
        labels_all = place_data(ds.train_labels)
        while args.steps - steps_done >= megastep:
            idx_chunk = np.stack([next(idx_it) for _ in range(megastep)]).astype(np.int32)
            states, key, metrics = mega(
                states, images_all, labels_all, jnp.asarray(idx_chunk), key
            )
            steps_done += megastep
            if args.log_every and (
                steps_done % args.log_every == 0 or megastep >= args.log_every
            ):
                print(f"step {steps_done}: member losses "
                      f"{[round(float(l),4) for l in metrics['loss']]}")

    step = make_ensemble_train_step(model.apply, tx, **aug_kwargs)
    for i in range(steps_done, args.steps):
        idx = next(idx_it)
        x, y = ds.train_images[idx], ds.train_labels[idx]
        key, sub = jax.random.split(key)
        states, metrics = step(states, place_batch(x), place_batch(y), sub)
        if args.log_every and (i + 1) % args.log_every == 0:
            print(f"step {i+1}: member losses {[round(float(l),4) for l in metrics['loss']]}")
    # gather to the default device so checkpointing sees addressable leaves
    return jax.tree.map(lambda leaf: jax.device_get(leaf), states.params)


def _pretrain_autoencoder(args) -> dict:
    """Train the conv-AE on normal data only and checkpoint it with its
    reconstruction-error baseline (the reference's AE-as-anomaly-sensor
    design, reference docs/system_notes.md:146-170)."""
    import jax.numpy as jnp

    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.models.cnn import ConvAutoencoder, create_autoencoder
    from fav_tpu.models.train import train_autoencoder
    from fav_tpu.utils.checkpoint import DEFAULT_CKPT_DIR, save_checkpoint

    out_dir = args.out or os.path.join(DEFAULT_CKPT_DIR, "autoencoder")
    ds = load_cifar10()
    if args.widths:
        from fav_tpu.models.cnn import ConvAutoencoder as AE

        widths = tuple(int(w) for w in args.widths.split(","))
        ae = AE(widths=widths, latent=widths[-1])
    else:
        ae = create_autoencoder()
    params, train_metrics = train_autoencoder(
        ae, ds.train_images, num_steps=args.steps, batch_size=args.batch,
        learning_rate=args.lr, seed=args.seed,
    )
    held_out = jnp.asarray(ds.test_images[:512])
    err = ConvAutoencoder.reconstruction_error(ae.apply(params, held_out), held_out)
    metrics = {
        "err_baseline": round(float(jnp.mean(err)), 6),
        "err_p95": round(float(jnp.percentile(err, 95)), 6),
        "final_train_loss": round(train_metrics["loss"], 6),
        "data_source": ds.source,
        "train_steps": args.steps,
        "model": "ConvAutoencoder",
        # serving rebuilds the exact architecture from these
        "ae_widths": list(ae.widths),
        "ae_latent": ae.latent,
    }
    print(json.dumps(metrics, indent=2))
    save_checkpoint(out_dir, params, metadata=metrics)
    print(f"checkpoint -> {out_dir}")
    return metrics


def _distill(args) -> dict:
    """Distill a trained teacher's MC-dropout predictive into a deterministic
    student (fav_tpu/models/distill.py) and checkpoint it with quality
    metrics measured the same way as a plain pretrain."""
    import jax
    import jax.numpy as jnp

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
    from fav_tpu.models.distill import distill_mc_dropout
    from fav_tpu.models.train import classifier_eval_step
    from fav_tpu.utils.checkpoint import (
        DEFAULT_CKPT_DIR,
        restore_checkpoint,
        save_checkpoint,
    )

    teacher_dir = args.teacher or os.path.join(DEFAULT_CKPT_DIR, "classifier")
    with open(os.path.join(teacher_dir, "metadata.json")) as f:
        meta = json.load(f)
    mp = ModelParams(
        arch=meta.get("arch", "vgg"),
        widths=tuple(meta.get("widths") or ModelParams().widths),
        dense_width=meta.get("dense_width") or ModelParams().dense_width,
    )
    model = create_model(mp)
    ds = load_cifar10()
    sample = jnp.zeros((1,) + ds.train_images.shape[1:], jnp.float32)
    template = model.init(jax.random.PRNGKey(0), sample)
    teacher, _ = restore_checkpoint(teacher_dir, template)

    student = distill_mc_dropout(
        model, teacher, ds.train_images,
        mc_samples=args.distill_mc, num_steps=args.steps, batch_size=args.batch,
        learning_rate=args.lr, seed=args.seed, log_every=args.log_every,
    )

    n_val = ds.test_images.shape[0] // 2
    val_x, val_y = jnp.asarray(ds.test_images[:n_val]), jnp.asarray(ds.test_labels[:n_val])
    test_x, test_y = jnp.asarray(ds.test_images[n_val:]), jnp.asarray(ds.test_labels[n_val:])
    val_logits = classifier_eval_step(model.apply, student, val_x, val_y)["logits"]
    out = classifier_eval_step(model.apply, student, test_x, test_y)
    temperature = float(fit_temperature(val_logits, val_y))
    probs = jax.nn.softmax(out["logits"] / temperature, axis=-1)
    conf = jnp.max(probs, axis=-1)
    preds = jnp.argmax(probs, axis=-1)
    correct = (preds == test_y).astype(jnp.float64)
    fails = failure_labels(preds, test_y)
    metrics = {
        "accuracy": round(float(out["accuracy"]), 4),
        "temperature": round(temperature, 4),
        # deploy-time conformal threshold, calibrated on the same
        # held-out clean split as the temperature (alpha = 0.1)
        **calibration_metadata(
            jax.nn.softmax(val_logits / temperature, axis=-1), val_y
        ),
        "ece": round(float(expected_calibration_error(conf, correct)), 4),
        "failure_auroc": (
            round(float(auroc(1.0 - conf, fails)), 4) if int(fails.sum()) > 0 else None
        ),
        "data_source": ds.source,
        "train_steps": args.steps,
        "distilled_from": teacher_dir,
        "distill_mc_samples": args.distill_mc,
        "arch": mp.arch,
        "widths": list(mp.widths),
        "dense_width": mp.dense_width,
    }
    print(json.dumps(metrics, indent=2))
    out_dir = args.out or os.path.join(DEFAULT_CKPT_DIR, "distilled")
    save_checkpoint(out_dir, student, metadata=metrics)
    print(f"checkpoint -> {out_dir}")
    return metrics


def _distill_ensemble(args) -> dict:
    """Distill the stacked-ensemble checkpoint into a compact student
    (fav_tpu/models/distill.py:distill_ensemble). The student's architecture
    comes from --widths (default: half the teacher's), so serving gets
    ensemble-grade confidence at a fraction of the per-frame FLOPs."""
    import jax
    import jax.numpy as jnp

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
    from fav_tpu.models.distill import distill_ensemble
    from fav_tpu.models.train import classifier_eval_step
    from fav_tpu.models.uncertainty import init_ensemble
    from fav_tpu.utils.checkpoint import (
        DEFAULT_CKPT_DIR,
        restore_checkpoint,
        save_checkpoint,
    )

    teacher_dir = args.teacher or os.path.join(DEFAULT_CKPT_DIR, "ensemble")
    with open(os.path.join(teacher_dir, "metadata.json")) as f:
        meta = json.load(f)
    t_mp = ModelParams(
        arch=meta.get("arch", "vgg"),
        widths=tuple(meta.get("widths") or ModelParams().widths),
        dense_width=meta.get("dense_width") or ModelParams().dense_width,
    )
    teacher_model = create_model(t_mp)
    ds = load_cifar10()
    sample = jnp.zeros((1,) + ds.train_images.shape[1:], jnp.float32)
    size = int(meta.get("ensemble_size") or 5)
    template = init_ensemble(teacher_model, jax.random.PRNGKey(0), sample, size)
    stacked, _ = restore_checkpoint(teacher_dir, template)

    if args.widths:
        widths = tuple(int(w) for w in args.widths.split(","))
    else:
        widths = tuple(w // 2 for w in t_mp.widths)
    s_mp = ModelParams(arch="vgg", widths=widths, dense_width=widths[-1],
                       standardize_input=args.standardize)
    student_model = create_model(s_mp)
    print(f"distilling {size}-member {t_mp.widths} ensemble -> student {widths}")

    student = distill_ensemble(
        student_model, teacher_model.apply, stacked,
        ds.train_images, ds.train_labels,
        num_steps=args.steps, batch_size=args.batch, learning_rate=args.lr,
        kd_temperature=args.kd_temperature, seed=args.seed, log_every=args.log_every,
        augmix=args.augmix, freq=args.freqband, occlude=args.occlude,
        bf16_aug=args.bf16_aug, megastep=args.megastep,
    )

    n_val = ds.test_images.shape[0] // 2
    val_x, val_y = jnp.asarray(ds.test_images[:n_val]), jnp.asarray(ds.test_labels[:n_val])
    test_x, test_y = jnp.asarray(ds.test_images[n_val:]), jnp.asarray(ds.test_labels[n_val:])
    val_logits = classifier_eval_step(student_model.apply, student, val_x, val_y)["logits"]
    out = classifier_eval_step(student_model.apply, student, test_x, test_y)
    temperature = float(fit_temperature(val_logits, val_y))
    probs = jax.nn.softmax(out["logits"] / temperature, axis=-1)
    conf = jnp.max(probs, axis=-1)
    preds = jnp.argmax(probs, axis=-1)
    correct = (preds == test_y).astype(jnp.float64)
    fails = failure_labels(preds, test_y)
    metrics = {
        "accuracy": round(float(out["accuracy"]), 4),
        "temperature": round(temperature, 4),
        # deploy-time conformal threshold, calibrated on the same
        # held-out clean split as the temperature (alpha = 0.1)
        **calibration_metadata(
            jax.nn.softmax(val_logits / temperature, axis=-1), val_y
        ),
        "ece": round(float(expected_calibration_error(conf, correct)), 4),
        "failure_auroc": (
            round(float(auroc(1.0 - conf, fails)), 4) if int(fails.sum()) > 0 else None
        ),
        "data_source": ds.source,
        "train_steps": args.steps,
        "distilled_from": teacher_dir,
        "teacher_ensemble_size": size,
        "kd_temperature": args.kd_temperature,
        **({"augmix_distill": True} if args.augmix else {}),
        **({"freqband": True} if args.freqband else {}),
        **({"occlude": True} if args.occlude else {}),
        **({"bf16_aug": True} if args.bf16_aug else {}),
        "ensemble_size": None,
        "arch": s_mp.arch,
        "widths": list(s_mp.widths),
        "dense_width": s_mp.dense_width,
        **({"standardize_input": True} if s_mp.standardize_input else {}),
    }
    print(json.dumps(metrics, indent=2))
    out_dir = args.out or os.path.join(DEFAULT_CKPT_DIR, "student_compact")
    save_checkpoint(out_dir, student, metadata=metrics)
    print(f"checkpoint -> {out_dir}")
    return metrics


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--log-every", type=int, default=200)
    parser.add_argument("--ensemble", type=int, default=0,
                        help="train an N-member deep ensemble (stacked params "
                             "checkpoint for uncertainty='ensemble' serving)")
    parser.add_argument("--shard", action="store_true",
                        help="shard ensemble training over all visible devices "
                             "(members on the mesh ensemble axis, batch on data)")
    parser.add_argument("--widths", type=str, default="",
                        help="comma-separated CNN stage widths (default: config)")
    parser.add_argument("--arch", type=str, default="vgg", choices=("vgg", "resnet", "vit"),
                        help="classifier family (fav_tpu/models/cnn.py)")
    parser.add_argument("--autoencoder", action="store_true",
                        help="train the conv autoencoder on normal frames; its "
                             "reconstruction-error baseline goes into checkpoint "
                             "metadata for uncertainty='autoencoder' serving")
    parser.add_argument("--distill-mc", type=int, default=0,
                        help="distill an existing teacher checkpoint's K-replica "
                             "MC-dropout predictive into a deterministic student "
                             "(single-forward calibrated confidence)")
    parser.add_argument("--teacher", type=str, default=None,
                        help="teacher checkpoint dir for --distill-mc "
                             "(default: checkpoints/classifier) or "
                             "--distill-ensemble (default: checkpoints/ensemble)")
    parser.add_argument("--distill-ensemble", action="store_true",
                        help="distill the stacked-ensemble checkpoint into a "
                             "compact student (--widths sets the student; "
                             "default: half the teacher's widths)")
    parser.add_argument("--kd-temperature", type=float, default=2.0,
                        help="Hinton KD temperature for --distill-ensemble")
    parser.add_argument("--augmix", action="store_true",
                        help="corruption-robust training: AugMix chains "
                             "(affine/posterize/solarize/autocontrast — "
                             "disjoint from the 15 test corruptions) with a "
                             "Jensen-Shannon consistency loss")
    parser.add_argument("--js-lam", type=float, default=12.0,
                        help="JS consistency weight for --augmix")
    parser.add_argument("--augmix-ce", action="store_true",
                        help="ensemble variant: plain CE on [clean; AugMix] "
                             "views, NO consistency term (keeps member "
                             "diversity the JS objective erodes)")
    parser.add_argument("--sam", type=float, default=0.0, metavar="RHO",
                        help="sharpness-aware minimization radius on top of "
                             "--augmix (0 = off; try 0.05)")
    parser.add_argument("--freqband", action="store_true",
                        help="add the spectral band-gain op to the AugMix "
                             "pool (weather-axis coverage: fog shifts the "
                             "low-frequency energy fraction 0.07->0.87 and "
                             "no base op is spectral; implies --augmix)")
    parser.add_argument("--occlude", action="store_true",
                        help="add the rectangular occlusion op (Cutout / "
                             "Random Erasing) to the AugMix pool (snow-axis "
                             "coverage: snow's failure mechanism is streak "
                             "occlusion and no base op removes information; "
                             "implies --augmix)")
    parser.add_argument("--occlude-bars", action="store_true",
                        help="add the oriented-bar occlusion op (rotated "
                             "thin rectangles, Random Erasing generalized "
                             "with an angle) to the AugMix pool — the "
                             "elongated-occluder analog of --occlude "
                             "targeting the snow streak geometry; implies "
                             "--augmix)")
    parser.add_argument("--bf16-aug", action="store_true",
                        help="run the AugMix chain + mixing in bfloat16 "
                             "(halves the augmentation's HBM traffic — the "
                             "train step's measured missing third; "
                             "randomness keys/draws stay f32, see "
                             "ops/augment.py augmix docstring)")
    parser.add_argument("--standardize", action="store_true",
                        help="per-image input standardization inside the "
                             "forward (models/cnn.py:standardize_image) — "
                             "invariance to affine luminance veils by "
                             "construction (the snow/fog/contrast base "
                             "mechanism; round-4 snow pre-registration). "
                             "Recorded in checkpoint metadata so serving/"
                             "evaluate rebuild the exact forward")
    parser.add_argument("--megastep", type=int, default=0, metavar="K",
                        help="run training as device-resident K-step scans "
                             "(one program, dataset resident on device, "
                             "indices-only upload; identical trajectory to "
                             "the per-step loop). Covers every objective: "
                             "plain CE, AugMix, SAM, DeepAugment, ensembles "
                             "and --distill-ensemble KD")
    parser.add_argument("--deepaugment", action="store_true",
                        help="route the second AugMix view through the "
                             "perturbed-weights autoencoder (DeepAugment; "
                             "learned-manifold distortions targeting the "
                             "weather-family robustness floor; implies "
                             "--augmix; needs checkpoints/autoencoder)")
    args = parser.parse_args(argv)

    if args.deepaugment:
        if args.ensemble:
            # member-independent AE perturbation draws are not wired; plain
            # bagging is the measured-best ensemble recipe anyway (BENCH.md)
            parser.error("--deepaugment is single-model only (use --augmix-ce "
                         "for ensemble augmentation)")
        args.augmix = True  # DeepAugment rides the AugMix consistency objective
    if args.freqband:
        if args.ensemble:
            parser.error("--freqband is single-model or KD only for now")
        args.augmix = True  # the spectral op rides the AugMix chain
    if args.occlude:
        if args.ensemble:
            parser.error("--occlude is single-model or KD only for now")
        args.augmix = True  # the occlusion op rides the AugMix chain
    if args.occlude_bars:
        if args.ensemble or args.distill_ensemble:
            # KD op-pool enrichment measured negative for both prior ops
            # (BENCH.md); the bar op is single-model direct training only
            parser.error("--occlude-bars is single-model only")
        args.augmix = True  # the bar op rides the AugMix chain

    if args.bf16_aug:
        if (args.ensemble or args.distill_mc or args.autoencoder
                or args.sam > 0 or args.deepaugment):
            # those objectives' step cores don't plumb the bf16 chain —
            # silently training f32 augmentation would misreport the recipe
            parser.error("--bf16-aug covers the plain AugMix objective "
                         "(single-model --augmix or --distill-ensemble "
                         "--augmix) only")
        if not args.augmix:
            parser.error("--bf16-aug needs the AugMix chain (--augmix, or "
                         "an op flag that implies it)")

    if args.augmix_ce and not args.ensemble:
        # --augmix-ce is an ensemble-only objective; alone it would silently
        # train plain CE with no augmentation at all
        parser.error("--augmix-ce requires --ensemble (use --augmix for the "
                     "single-model JS-consistency objective)")

    if args.megastep and (args.distill_mc or args.autoencoder):
        parser.error("--megastep does not cover --distill-mc/--autoencoder "
                     "(their per-step loops are not index-stream based)")

    if args.autoencoder:
        return _pretrain_autoencoder(args)
    if args.distill_mc:
        return _distill(args)
    if args.distill_ensemble:
        return _distill_ensemble(args)

    import jax
    import jax.numpy as jnp

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
    from fav_tpu.models.train import classifier_eval_step, train_classifier
    from fav_tpu.utils.checkpoint import DEFAULT_CKPT_DIR, save_checkpoint

    out_dir = args.out or os.path.join(
        DEFAULT_CKPT_DIR, "ensemble" if args.ensemble else "classifier"
    )
    ds = load_cifar10()
    print(f"dataset: {ds.source} ({ds.train_images.shape[0]} train / {ds.test_images.shape[0]} test)")

    mp = ModelParams(arch=args.arch, standardize_input=args.standardize)
    if args.widths:
        widths = tuple(int(w) for w in args.widths.split(","))
        mp = ModelParams(arch=args.arch, widths=widths, dense_width=widths[-1],
                         standardize_input=args.standardize)
    model = create_model(mp)
    if args.ensemble:
        params = _train_ensemble(model, ds, args)
    else:
        params, _ = train_classifier(
            model, ds, num_steps=args.steps, batch_size=args.batch,
            learning_rate=args.lr, seed=args.seed, log_every=args.log_every,
            augmix=args.augmix, js_lam=args.js_lam, sam_rho=args.sam,
            deepaugment=args.deepaugment, freq_aug=args.freqband,
            occlude_aug=args.occlude, bars_aug=args.occlude_bars,
            bf16_aug=args.bf16_aug, megastep=args.megastep,
        )

    # held-out split: half for temperature fitting, half for reporting
    n_val = ds.test_images.shape[0] // 2
    val_x, val_y = jnp.asarray(ds.test_images[:n_val]), jnp.asarray(ds.test_labels[:n_val])
    test_x, test_y = jnp.asarray(ds.test_images[n_val:]), jnp.asarray(ds.test_labels[n_val:])

    if args.ensemble:
        # logit-averaged ensemble: temperature fits on the mean logits
        def eval_logits(x):
            return jnp.mean(jax.vmap(lambda p: model.apply(p, x))(params), axis=0)

        val_logits = eval_logits(val_x)
        logits = eval_logits(test_x)
        accuracy = jnp.mean(jnp.argmax(logits, -1) == test_y)
        out = {"accuracy": accuracy, "logits": logits}
    else:
        val_logits = classifier_eval_step(model.apply, params, val_x, val_y)["logits"]
        out = classifier_eval_step(model.apply, params, test_x, test_y)
        logits = out["logits"]
    temperature = float(fit_temperature(val_logits, val_y))
    probs = jax.nn.softmax(logits / temperature, axis=-1)
    conf = jnp.max(probs, axis=-1)
    preds = jnp.argmax(probs, axis=-1)
    correct = (preds == test_y).astype(jnp.float64)
    fails = failure_labels(preds, test_y)
    metrics = {
        "accuracy": round(float(out["accuracy"]), 4),
        "temperature": round(temperature, 4),
        # deploy-time conformal threshold, calibrated on the same
        # held-out clean split as the temperature (alpha = 0.1)
        **calibration_metadata(
            jax.nn.softmax(val_logits / temperature, axis=-1), val_y
        ),
        "ece": round(float(expected_calibration_error(conf, correct)), 4),
        "ece_uncalibrated": round(
            float(
                expected_calibration_error(
                    jnp.max(jax.nn.softmax(logits, -1), -1), correct
                )
            ),
            4,
        ),
        "failure_auroc": (
            round(float(auroc(1.0 - conf, fails)), 4) if int(fails.sum()) > 0 else None
        ),
        "data_source": ds.source,
        "train_steps": args.steps,
        "ensemble_size": args.ensemble or None,
        **({"augmix": True, "js_lam": args.js_lam} if args.augmix else {}),
        **({"augmix_ce": True} if args.augmix_ce else {}),
        **({"sam_rho": args.sam} if args.sam else {}),
        **({"deepaugment": True} if args.deepaugment else {}),
        **({"freqband": True} if args.freqband else {}),
        **({"occlude": True} if args.occlude else {}),
        **({"occlude_bars": True} if args.occlude_bars else {}),
        **({"bf16_aug": True} if args.bf16_aug else {}),
        # serving rebuilds the exact architecture from these — a template
        # mismatch must be impossible, not silently tolerated
        "arch": mp.arch,
        "widths": list(mp.widths),
        "dense_width": mp.dense_width,
        **({"standardize_input": True} if mp.standardize_input else {}),
        **(
            {"vit_dim": mp.vit_dim, "vit_depth": mp.vit_depth, "vit_heads": mp.vit_heads}
            if mp.arch == "vit"
            else {}
        ),
    }
    print(json.dumps(metrics, indent=2))

    save_checkpoint(out_dir, params, metadata=metrics)
    print(f"checkpoint -> {out_dir}")
    return metrics


def cli_main(argv=None) -> None:
    """Console-script entry (`fav-pretrain`, pyproject.toml): :func:`main`
    returns the metrics dict for programmatic callers, which must not leak
    into ``sys.exit``."""
    main(argv)


if __name__ == "__main__":
    main()
