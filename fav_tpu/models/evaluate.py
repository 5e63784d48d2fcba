"""Corruption-sweep evaluation CLI: the full 15x5 robustness grid.

Usage: ``python -m fav_tpu.models.evaluate [--checkpoint DIR...] [--out FILE]``

Runs every (corruption, severity) cell of the CIFAR-10-C-style grid through
the (checkpointed or freshly trained) classifier and reports per-cell
accuracy, confidence, failure-detection AUROC and the trust-engine anomaly
scalar — fault injection as *data*, replacing the reference's UI-slider-only
injection (SURVEY.md §5.3). With multiple devices visible, images shard over
the mesh's data axis automatically.

``--checkpoint`` accepts MULTIPLE directories: the grid program is compiled
(and, on the tunneled TPU, uploaded — the measured 84 s first-dispatch cost,
ROADMAP #11) once per *architecture*, so evaluating N same-arch checkpoints
in one invocation costs one session overhead + ~0.35 s device compute per
extra grid instead of N full sessions. Model instances are cached per
ModelParams so ``apply_fn`` hashes equal across checkpoints and the jitted
``_fused_grid`` executable is reused.
"""

from __future__ import annotations

import argparse
import json
import os

# Module instances cached per ModelParams: jax.jit treats `model.apply` as a
# static argument, and equal-but-distinct Flax module trees would recompile
# (on the tunnel: re-upload) the fused grid program for every checkpoint of
# the same architecture.
_MODEL_CACHE: dict = {}


def _cached_model(mp):
    from fav_tpu.models.cnn import create_model

    if mp not in _MODEL_CACHE:
        _MODEL_CACHE[mp] = create_model(mp)
    return _MODEL_CACHE[mp]


def _model_params_for(ckpt: str, args, parser):
    """Resolve ModelParams: checkpoint metadata wins over CLI arch/width
    flags (same integrity rule as serving: rebuilding the wrong template
    must be impossible)."""
    from fav_tpu.config import ModelParams, model_params_from_metadata

    mp = ModelParams(arch=args.arch)
    if args.widths:
        widths = tuple(int(w) for w in args.widths.split(","))
        mp = ModelParams(arch=args.arch, widths=widths, dense_width=widths[-1])
    meta_path = os.path.join(ckpt, "metadata.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        mp = model_params_from_metadata(mp, meta)
    return mp


def _load_monitor(monitor_dir: str, sample, parser):
    """Build the decoupled monitor (apply, params, temperature); must exist —
    a random-init monitor would score noise and silently report a broken
    deployment as measured."""
    import jax

    from fav_tpu.config import ModelParams, model_params_from_metadata
    from fav_tpu.utils.checkpoint import restore_checkpoint

    mon_meta_path = os.path.join(monitor_dir, "metadata.json")
    if not os.path.isfile(mon_meta_path):
        parser.error(f"--monitor: no checkpoint at {monitor_dir}")
    with open(mon_meta_path) as f:
        mon_meta = json.load(f)
    mon_mp = model_params_from_metadata(ModelParams(), mon_meta)
    mon_model = _cached_model(mon_mp)
    mon_params = mon_model.init(jax.random.PRNGKey(0), sample)
    mon_params, mon_meta = restore_checkpoint(monitor_dir, mon_params)
    return (mon_model.apply, mon_params, float(mon_meta.get("temperature", 1.0)))


def _evaluate_checkpoint(ckpt, args, ds, images, labels, monitor, parser) -> dict:
    """One checkpoint through the full grid; the heavy jitted programs are
    shared across calls via the module-level model cache."""
    import jax
    import jax.numpy as jnp

    from fav_tpu.models.train import train_classifier
    from fav_tpu.ops.corruptions import CORRUPTION_NAMES
    from fav_tpu.parallel.mesh import build_mesh
    from fav_tpu.parallel.sweep import corruption_sweep, fused_sweep, sharded_sweep
    from fav_tpu.utils.checkpoint import restore_checkpoint

    mp = _model_params_for(ckpt, args, parser)
    model = _cached_model(mp)
    sample = jnp.zeros((1,) + ds.test_images.shape[1:], jnp.float32)
    # multi-forward scorers hand the sweep STACKED member logits [M, B, C]:
    # sweep._reduce_members keeps predictions on the logit average (bitwise
    # what the mean-apply path computed) and additionally scores the BALD
    # mutual-information row (epistemic disagreement as a third detection
    # signal). ``apply_fn`` stays the flat mean for single-output consumers
    # (conformal calibration).
    member_apply = None
    if args.ensemble:
        from fav_tpu.models.uncertainty import init_ensemble

        params = init_ensemble(model, jax.random.PRNGKey(0), sample, args.ensemble)
        member_apply = lambda p, x: jax.vmap(  # noqa: E731
            lambda q: model.apply(q, x)
        )(p)
        apply_fn = lambda p, x: jnp.mean(member_apply(p, x), axis=0)  # noqa: E731
    elif args.mc_dropout:
        params = model.init(jax.random.PRNGKey(0), sample)
        mc_keys = jax.random.split(jax.random.PRNGKey(7), args.mc_dropout)

        def member_apply(p, x):
            def one(k):
                return model.apply(p, x, train=True, rngs={"dropout": k})

            return jax.vmap(one)(mc_keys)

        def apply_fn(p, x):
            return jnp.mean(member_apply(p, x), axis=0)
    else:
        params = model.init(jax.random.PRNGKey(0), sample)
        apply_fn = model.apply
    if args.tta > 1:
        # wrap whatever scorer was built above: mean logits over the clean
        # view + K-1 AugMix views. A prediction that survives label-invariant
        # lossy transforms deserves its confidence; one that flips under them
        # does not — the transform keys are fixed so the sweep stays
        # deterministic (fold_in per view).
        from fav_tpu.ops.augment import augmix as _augmix

        tta_key = jax.random.PRNGKey(11)

        def _tta_wrap(_base):
            def wrapped(p, x):
                logits = _base(p, x)
                for i in range(args.tta - 1):
                    view = _augmix(jax.random.fold_in(tta_key, i), x)
                    logits = logits + _base(p, view)
                return logits / args.tta

            return wrapped

        apply_fn = _tta_wrap(apply_fn)  # noqa: F811 — deliberate wrap
        if member_apply is not None:
            member_apply = _tta_wrap(member_apply)

    temperature = 1.0
    source = "random_init"

    if os.path.isdir(ckpt):
        params, meta = restore_checkpoint(ckpt, params)
        temperature = float(meta.get("temperature", 1.0))
        source = f"checkpoint:{ckpt}"
    elif args.train_steps > 0 and not args.ensemble:
        params, _ = train_classifier(model, ds, num_steps=args.train_steps)
        source = f"trained:{args.train_steps}steps"

    if args.maha:
        # feature-space failure scores: fit class Gaussians on penultimate
        # TRAIN-set features (the in-distribution manifold), then wrap the
        # scorer so every cell also ships Mahalanobis / relative-Mahalanobis
        # rows (sweep extra-score contract). The fit matrices are closure-
        # baked into the jitted program as constants — never per-call jit
        # arguments (CLAUDE.md tunnel-backend lesson).
        from fav_tpu.models.mahalanobis import (
            collect_features,
            features_and_logits,
            fit_feature_gaussians,
            mahalanobis_scores,
        )

        n_fit = min(args.maha_fit_images, ds.train_images.shape[0])
        fit_feats = collect_features(model, params, jnp.asarray(ds.train_images[:n_fit]))
        maha_fit = fit_feature_gaussians(
            fit_feats, ds.train_labels[:n_fit], mp.num_classes
        )

        def apply_fn(p, x, _fit=maha_fit):  # noqa: F811 — deliberate wrap
            feats, logits = features_and_logits(model, p, x)
            return logits, mahalanobis_scores(feats, _fit)

    n = images.shape[0]
    names = tuple(c for c in args.corruptions.split(",") if c) or CORRUPTION_NAMES

    key = jax.random.PRNGKey(42)
    # multi-forward scorers (M members / K replicas) blow the HBM liveness
    # budget in a single 75-cell program — bound the chunk size by the
    # forwards-per-cell multiplier (fused_sweep docstring)
    multi = max(args.ensemble, args.mc_dropout, args.tta, 1)
    if monitor is not None:
        multi += 1  # the monitor forward rides every cell
    cells_per_call = 0 if multi <= 1 else max(1, 25 // multi)
    want_probs = args.conformal > 0.0
    # policy-space replay (VERDICT r4 missing #2): keep the per-sample rows
    # the trust-stream composition needs — they already ride the single D2H
    want_rows: tuple = ()
    if args.policy:
        want_rows = ("l1_status", "l1_anomaly", "conf", "correct")
        if monitor is not None:
            want_rows += ("mon_conf",)
    sweep_apply = member_apply if member_apply is not None else apply_fn
    if jax.device_count() > 1 and n % jax.device_count() == 0:
        mesh = build_mesh((jax.device_count(), 1, 1))
        grid = sharded_sweep(mesh, sweep_apply, params, images, labels, key,
                             corruptions=names, temperature=temperature,
                             fused=not args.per_cell,
                             cells_per_call=cells_per_call,
                             return_probs=want_probs, monitor=monitor,
                             return_rows=want_rows)
    else:
        if args.per_cell:
            grid = corruption_sweep(sweep_apply, params, images, labels, key,
                                    corruptions=names, temperature=temperature)
        else:
            grid = fused_sweep(sweep_apply, params, images, labels, key,
                               corruptions=names, temperature=temperature,
                               cells_per_call=cells_per_call,
                               return_probs=want_probs, monitor=monitor,
                               return_rows=want_rows)
    policy_summary = None
    if args.policy:
        from fav_tpu.core.policy_replay import grid_policy

        grid, cells, rows = grid
        policy_rows = grid_policy(cells, rows, ticks=args.policy_ticks)
        for (cname, sev), prow in zip(cells, policy_rows):
            grid[cname][sev].update(prow)
        # the composed system's blind spot, in policy space: cells whose
        # accuracy is destroyed yet the trust engine never leaves ALLOWED
        never_blocked_low_acc = [
            f"{cname}/{sev}"
            for (cname, sev), prow in zip(cells, policy_rows)
            if grid[cname][sev]["accuracy"] < 0.30
            and prow["time_to_blocked_s"] < 0
        ]
        worst_allowed_wrong = sorted(
            (
                (round(prow["allowed_wrong_share"], 4), f"{cname}/{sev}")
                for (cname, sev), prow in zip(cells, policy_rows)
            ),
            reverse=True,
        )[:5]
        n_cells = len(policy_rows)
        policy_summary = {
            "ticks": args.policy_ticks,
            "dt": 1.0 / 30.0,
            **{
                f"mean_share_{s}": round(
                    sum(r[f"policy_share_{s}"] for r in policy_rows) / n_cells, 4
                )
                for s in ("vision_allowed", "vision_declining",
                          "vision_degraded", "vision_blocked")
            },
            "mean_allowed_wrong_share": round(
                sum(r["allowed_wrong_share"] for r in policy_rows) / n_cells, 4
            ),
            "cells_blocked": sum(
                1 for r in policy_rows if r["time_to_blocked_s"] > 0
            ),
            "never_blocked_low_acc_cells": never_blocked_low_acc,
            "worst_allowed_wrong": [
                {"cell": c, "allowed_wrong_share": v}
                for v, c in worst_allowed_wrong
            ],
        }
    conformal_summary = None
    if want_probs:
        from fav_tpu.models.conformal import attach_conformal_metrics

        grid, cells, cell_probs = grid
        conformal_summary = attach_conformal_metrics(
            grid, cells, cell_probs, labels,
            apply_fn=apply_fn, params=params, temperature=temperature,
            cal_images=jnp.asarray(ds.test_images[n:]),
            cal_labels=jnp.asarray(ds.test_labels[n:]),
            alpha=args.conformal,
        )

    # aggregate: mean over severities per corruption + overall. AUROC is only
    # defined where failures exist — zero-failure cells are excluded, not
    # counted as 0 (ranking nothing is not "perfectly wrong").
    def agg(cells):
        with_fail = [c for c in cells.values() if c["failure_rate"] > 0]
        out = {
            "accuracy": round(sum(c["accuracy"] for c in cells.values()) / len(cells), 4),
            "auroc": None,
            # calibration under shift: mean per-cell ECE/Brier across the
            # severity column — does the clean-fit temperature survive?
            "ece": round(sum(c["ece"] for c in cells.values()) / len(cells), 4),
            "brier": round(sum(c["brier"] for c in cells.values()) / len(cells), 4),
            "mean_anomaly": round(sum(c["mean_anomaly"] for c in cells.values()) / len(cells), 4),
        }
        if with_fail:
            for m in ("auroc", "auroc_energy", "aupr", "fpr_at_95"):
                out[m] = round(sum(c[m] for c in with_fail) / len(with_fail), 4)
            for m in ("auroc_self", "auroc_gated", "auroc_mi", "auroc_vote",
                      "auroc_maha", "auroc_rmd", "auroc_l1", "auroc_composed"):
                if all(m in c for c in with_fail):
                    out[m] = round(sum(c[m] for c in with_fail) / len(with_fail), 4)
        for m in ("ece_self", "ece_gated", "mean_mi", "ece_vote", "mean_agreement",
                  "mean_maha", "mean_rmd", "l1_flag_rate", "l1_mean_anomaly",
                  "mean_anomaly_composed"):
            if all(m in c for c in cells.values()):
                out[m] = round(sum(c[m] for c in cells.values()) / len(cells), 4)
        if all("coverage" in c for c in cells.values()):
            out["coverage"] = round(sum(c["coverage"] for c in cells.values()) / len(cells), 4)
            out["set_size"] = round(sum(c["set_size"] for c in cells.values()) / len(cells), 3)
        return out

    per_corruption = {name: agg(cells) for name, cells in grid.items()}

    # defense-in-depth accounting, computed BY the evaluation itself (VERDICT
    # r4 missing #3): cells the deployment is confidently wrong on (accuracy
    # < 0.30 at operative confidence > 0.60 — tools/multidraw_report.py
    # thresholds), split by whether the L1 analyzer majority-flags them.
    # An UNFLAGGED confident-wrong cell is the composed system's true blind
    # spot — neither the model's own confidence nor the model-independent
    # perception layer sees the failure.
    confident_wrong: list[dict] = []
    for name, cells in grid.items():
        for sev, c in cells.items():
            op_conf = c.get("mean_confidence_gated", c["mean_confidence"])
            if c["accuracy"] < 0.30 and op_conf > 0.60:
                confident_wrong.append({
                    "cell": f"{name}/{sev}",
                    "accuracy": round(c["accuracy"], 4),
                    "confidence": round(op_conf, 4),
                    "l1_flag_rate": round(c.get("l1_flag_rate", float("nan")), 4),
                    "l1_mean_anomaly": round(c.get("l1_mean_anomaly", float("nan")), 4),
                })
    unflagged = [
        r for r in confident_wrong
        if not (r["l1_flag_rate"] == r["l1_flag_rate"] and r["l1_flag_rate"] >= 0.5)
    ]

    def overall_mean(metric):
        vals = [v[metric] for v in per_corruption.values() if v.get(metric) is not None]
        return round(sum(vals) / len(vals), 4) if vals else None

    overall = {
        "model": source,
        "images_per_cell": n,
        "mean_corrupted_accuracy": round(
            sum(v["accuracy"] for v in per_corruption.values()) / len(per_corruption), 4
        ),
        "mean_failure_auroc": overall_mean("auroc"),
        "mean_failure_auroc_energy": overall_mean("auroc_energy"),
        # BALD mutual information — only multi-forward scorers have a
        # member axis to disagree over
        **(
            {
                "mean_failure_auroc_mi": overall_mean("auroc_mi"),
                # vote-gated deployment pairing: min(MSP, member agreement)
                "mean_failure_auroc_vote": overall_mean("auroc_vote"),
                "mean_ece_vote": overall_mean("ece_vote"),
            }
            if (args.ensemble or args.mc_dropout) else {}
        ),
        # feature-space scores (Lee et al. 2018 / Ren et al. 2021) — the
        # detection axis logit-space signals cannot see
        **(
            {
                "mean_failure_auroc_maha": overall_mean("auroc_maha"),
                "mean_failure_auroc_rmd": overall_mean("auroc_rmd"),
            }
            if args.maha else {}
        ),
        "mean_failure_aupr": overall_mean("aupr"),
        "mean_fpr_at_95": overall_mean("fpr_at_95"),
        "mean_ece": overall_mean("ece"),
        "mean_brier": overall_mean("brier"),
        # first-class L1 analyzer columns (parallel/sweep.py:_l1_rows) +
        # the defense-in-depth account the side tool used to compute
        "mean_l1_flag_rate": overall_mean("l1_flag_rate"),
        "mean_failure_auroc_l1": overall_mean("auroc_l1"),
        "mean_failure_auroc_composed": overall_mean("auroc_composed"),
        "confident_wrong_cells": confident_wrong,
        "unflagged_confident_wrong_cells": unflagged,
        "devices": jax.device_count(),
        "data_source": ds.source,
        **({"tta_views": args.tta} if args.tta > 1 else {}),
        **(
            {
                "monitor": args.monitor,
                "mean_failure_auroc_self": overall_mean("auroc_self"),
                "mean_ece_self": overall_mean("ece_self"),
                "mean_failure_auroc_gated": overall_mean("auroc_gated"),
                "mean_ece_gated": overall_mean("ece_gated"),
            }
            if monitor is not None
            else {}
        ),
    }
    if conformal_summary is not None:
        overall["conformal"] = conformal_summary
    if policy_summary is not None:
        overall["policy"] = policy_summary
    return {"summary": overall, "per_corruption": per_corruption, "grid": grid}


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", type=str, nargs="*", default=None,
                        help="checkpoint dir(s); several same-arch dirs share "
                             "one compiled/uploaded grid program (~0.35 s per "
                             "extra grid instead of a full session each)")
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--num-images", type=int, default=2048)
    parser.add_argument("--train-steps", type=int, default=0,
                        help="train this many steps if no checkpoint is found")
    parser.add_argument("--corruptions", type=str, default="",
                        help="comma-separated subset (default: all 15)")
    parser.add_argument("--widths", type=str, default="",
                        help="comma-separated CNN stage widths (default: config)")
    parser.add_argument("--arch", type=str, default="vgg", choices=("vgg", "resnet", "vit"),
                        help="classifier family (fav_tpu/models/cnn.py)")
    parser.add_argument("--ensemble", type=int, default=0,
                        help="evaluate an N-member ensemble checkpoint "
                             "(checkpoints/ensemble unless --checkpoint): "
                             "member-logit-averaged forward in every cell")
    parser.add_argument("--mc-dropout", type=int, default=0,
                        help="evaluate the single-model checkpoint with N "
                             "MC-dropout replicas (logit-averaged)")
    parser.add_argument("--tta", type=int, default=0, metavar="K",
                        help="test-time augmentation: average logits over the "
                             "clean view + K-1 label-invariant AugMix views "
                             "(PAPERS.md: lossy label-invariant transformations "
                             "improve classifier confidence; views are "
                             "leak-free vs the grid by construction). One "
                             "K-view batched forward per cell, like "
                             "--mc-dropout's replicas")
    parser.add_argument("--per-cell", action="store_true",
                        help="dispatch one program per grid cell instead of "
                             "the fused whole-grid program (debugging aid)")
    parser.add_argument("--conformal", type=float, default=0.0, metavar="ALPHA",
                        help="split-conformal prediction sets at miscoverage "
                             "ALPHA (e.g. 0.1): calibrate on held-out clean "
                             "data, report coverage + set size per grid cell "
                             "(fav_tpu/models/conformal.py; fused path only)")
    parser.add_argument("--maha", action="store_true",
                        help="feature-space failure scores: fit class-"
                             "conditional Gaussians on penultimate train-set "
                             "features and report per-cell Mahalanobis + "
                             "relative-Mahalanobis AUROC (auroc_maha/"
                             "auroc_rmd; fav_tpu/models/mahalanobis.py). "
                             "Single-forward scorers only")
    parser.add_argument("--maha-fit-images", type=int, default=10240,
                        help="train images used for the Gaussian fit")
    parser.add_argument("--policy", action="store_true",
                        help="policy-space replay (core/policy_replay.py): "
                             "each cell's per-sample L1 statuses + composed "
                             "anomalies (the serving composition, min-gated "
                             "under --monitor) replay through the trust scan "
                             "at 30 Hz; per-cell policy time-shares, "
                             "time-to-BLOCKED and allowed-wrong share join "
                             "the grid (fused path only)")
    parser.add_argument("--policy-ticks", type=int, default=900,
                        help="replay stream length in ticks (30 s default)")
    parser.add_argument("--monitor", type=str, default=None, metavar="DIR",
                        help="decoupled predictor/monitor deployment: "
                             "predictions (accuracy) come from the main "
                             "checkpoint, the failure score and operative "
                             "calibration come from this independent "
                             "checkpoint's confidence on the same corrupted "
                             "batch (the reference's bounded-ML invariant "
                             "applied across the model zoo; predictor "
                             "self-scores kept as auroc_self/ece_self)")
    args = parser.parse_args(argv)
    if args.conformal and args.per_cell:
        parser.error("--conformal requires the fused sweep path")
    if args.policy and (args.per_cell or args.conformal):
        parser.error("--policy requires the fused sweep path and is "
                     "mutually exclusive with --conformal")
    if args.monitor and (args.per_cell or args.conformal or args.tta > 1):
        parser.error("--monitor requires the fused sweep path and is "
                     "mutually exclusive with --conformal/--tta")
    if args.maha and (args.ensemble or args.mc_dropout or args.tta > 1
                      or args.conformal or args.monitor):
        parser.error("--maha is a single-forward feature-space score; it is "
                     "mutually exclusive with --ensemble/--mc-dropout/--tta/"
                     "--conformal/--monitor")

    import jax

    # persistent compilation cache: 75 grid cells = 75 programs; repeat runs
    # (and bench.py, which shares the cache dir) skip recompiles
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.utils.checkpoint import DEFAULT_CKPT_DIR

    ds = load_cifar10()
    default_name = "ensemble" if args.ensemble else "classifier"
    ckpts = args.checkpoint or [os.path.join(DEFAULT_CKPT_DIR, default_name)]

    n = min(args.num_images, ds.test_images.shape[0])
    images = jnp.asarray(ds.test_images[:n])
    labels = jnp.asarray(ds.test_labels[:n])

    monitor = None
    if args.monitor:
        sample = jnp.zeros((1,) + ds.test_images.shape[1:], jnp.float32)
        monitor = _load_monitor(args.monitor, sample, parser)

    results: dict[str, dict] = {}
    for ckpt in ckpts:
        result = _evaluate_checkpoint(ckpt, args, ds, images, labels, monitor, parser)
        results[ckpt] = result
        print(json.dumps(result["summary"], indent=2))

    if len(ckpts) == 1:
        result = results[ckpts[0]]
        if args.out:
            with open(args.out, "w") as f:
                json.dump(result, f, indent=2)
            print(f"full grid -> {args.out}")
        return result
    combined = {"checkpoints": results}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(combined, f, indent=2)
        print(f"full grids -> {args.out}")
    return combined


def cli_main(argv=None) -> None:
    """Console-script entry (`fav-evaluate`, pyproject.toml): :func:`main`
    returns the result dict for programmatic callers, which must not leak
    into ``sys.exit``."""
    main(argv)


if __name__ == "__main__":
    main()
