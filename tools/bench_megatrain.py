"""A/B the device-resident training megastep vs the per-step host loop on
TPU (same session — tunnel throughput varies between sessions, CLAUDE.md).

The per-step loop pays, per step: one ~10 ms dispatch + the full batch H2D
(batch 1024 float32 = 12.6 MB over a ~38 MB/s tunnel). The megastep ships
the dataset once and uploads only [K, B] int32 indices per K-step program.

Usage: python tools/bench_megatrain.py [--batch 1024] [--steps 40] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--augmix", action="store_true")
    ap.add_argument("--kd", action="store_true",
                    help="A/B ensemble-KD distillation (5-member config-scale "
                         "teacher -> half-width student) instead of classifier "
                         "training")
    ap.add_argument("--ensemble", type=int, default=0, metavar="N",
                    help="A/B N-member vmapped ensemble training (the KD "
                         "teacher recipe) instead of single-model training")
    ap.add_argument("--sam", type=float, default=0.0, metavar="RHO",
                    help="A/B the SAM+AugMix objective (two backward passes "
                         "per step) at perturbation radius RHO")
    ap.add_argument("--deepaugment", action="store_true",
                    help="A/B the DeepAugment+AugMix objective (the shipped "
                         "AE checkpoint rides resident inside the megastep)")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import synthetic_cifar10, index_iterator
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.train import (
        augmix_train_step, classifier_train_step, create_train_state,
        deepaugment_train_step, make_train_megastep, sam_augmix_train_step,
    )

    ds = synthetic_cifar10()
    if args.kd:
        return bench_kd(args, ds)
    if args.ensemble:
        return bench_ensemble(args, ds)
    model = create_model(ModelParams())
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)

    def fresh_state():
        params = model.init(jax.random.PRNGKey(1), sample)
        return create_train_state(params, 1e-3)

    lam = jnp.float32(12.0)
    rho = jnp.float32(args.sam)
    ae_apply = ae_params = None
    if args.deepaugment:
        from fav_tpu.ops.deepaugment import load_augmenter

        ae_apply, ae_params = load_augmenter()

    # ── per-step loop (numpy batch -> H2D per step, one dispatch per step) ──
    state, tx = fresh_state()
    it = index_iterator(ds.train_images.shape[0], args.batch, seed=0)

    def one_step(state, key):
        idx = next(it)
        images, labels = ds.train_images[idx], ds.train_labels[idx]
        key, sk = jax.random.split(key)
        if args.deepaugment:
            state, m = deepaugment_train_step(
                model.apply, ae_apply, tx, state, jnp.asarray(images),
                jnp.asarray(labels), sk, lam, ae_params,
            )
        elif args.sam > 0:
            state, m = sam_augmix_train_step(
                model.apply, tx, state, jnp.asarray(images), jnp.asarray(labels),
                sk, lam, rho,
            )
        elif args.augmix:
            state, m = augmix_train_step(
                model.apply, tx, state, jnp.asarray(images), jnp.asarray(labels), sk, lam
            )
        else:
            state, m = classifier_train_step(
                model.apply, tx, state, jnp.asarray(images), jnp.asarray(labels), sk
            )
        return state, key, m

    for _ in range(3):  # warm compiles
        state, key, m = one_step(state, key)
    _ = float(m["loss"])  # barrier
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, key, m = one_step(state, key)
    _ = float(m["loss"])  # device-to-host fetch = completion barrier
    per_step = (time.perf_counter() - t0) / args.steps

    # ── megastep (dataset resident, [K, B] indices per call) ──
    state, tx = fresh_state()
    mega = make_train_megastep(
        model.apply, tx,
        augmix=args.augmix or args.sam > 0 or args.deepaugment,
        sam_rho=args.sam, deepaugment=args.deepaugment, ae_apply=ae_apply,
        ae_params=ae_params,
    )
    images_all = jnp.asarray(ds.train_images)
    labels_all = jnp.asarray(ds.train_labels)
    it = index_iterator(ds.train_images.shape[0], args.batch, seed=0)
    key = jax.random.PRNGKey(0)

    def one_chunk(state, key):
        idx = np.stack([next(it) for _ in range(args.k)]).astype(np.int32)
        return mega(state, images_all, labels_all, jnp.asarray(idx), key)

    state, key, m = one_chunk(state, key)  # warm compile
    _ = float(m["loss"])
    n_chunks = max(1, args.steps // args.k)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, key, m = one_chunk(state, key)
    _ = float(m["loss"])
    per_step_mega = (time.perf_counter() - t0) / (n_chunks * args.k)

    objective = (
        "deepaugment" if args.deepaugment
        else f"sam={args.sam}" if args.sam > 0
        else "augmix" if args.augmix
        else "ce"
    )
    print({
        "objective": objective,
        "batch": args.batch, "k": args.k, "steps": args.steps,
        "per_step_loop_ms": round(per_step * 1e3, 1),
        "megastep_ms_per_step": round(per_step_mega * 1e3, 1),
        "speedup": round(per_step / per_step_mega, 2),
        "loop_img_per_s": round(args.batch / per_step),
        "mega_img_per_s": round(args.batch / per_step_mega),
    })


def bench_ensemble(args, ds) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import index_iterator
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.train import (
        TrainState, make_ensemble_megastep, make_ensemble_train_step,
    )
    from fav_tpu.models.uncertainty import init_ensemble

    model = create_model(ModelParams())
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    stacked = init_ensemble(model, jax.random.PRNGKey(0), sample, args.ensemble)
    tx = optax.adamw(1e-3)

    def fresh():
        params = jax.tree.map(jnp.copy, stacked)
        return TrainState(
            params, jax.vmap(tx.init)(params),
            jnp.zeros((args.ensemble,), jnp.int32),
        )

    # per-step loop (numpy batch -> H2D per step, one dispatch per step)
    states = fresh()
    step = make_ensemble_train_step(model.apply, tx, augmix=args.augmix)
    it = index_iterator(ds.train_images.shape[0], args.batch, seed=0)
    key = jax.random.PRNGKey(0)

    def one_step(states, key):
        idx = next(it)
        key, sub = jax.random.split(key)
        states, m = step(states, jnp.asarray(ds.train_images[idx]),
                         jnp.asarray(ds.train_labels[idx]), sub)
        return states, key, m

    for _ in range(3):
        states, key, m = one_step(states, key)
    _ = float(m["loss"][0])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        states, key, m = one_step(states, key)
    _ = float(m["loss"][0])
    per_step = (time.perf_counter() - t0) / args.steps

    # megastep (dataset resident, [K, B] indices per call)
    states = fresh()
    mega = make_ensemble_megastep(model.apply, tx, augmix=args.augmix)
    images_all = jnp.asarray(ds.train_images)
    labels_all = jnp.asarray(ds.train_labels)
    it = index_iterator(ds.train_images.shape[0], args.batch, seed=0)
    key = jax.random.PRNGKey(0)

    def one_chunk(states, key):
        idx = np.stack([next(it) for _ in range(args.k)]).astype(np.int32)
        return mega(states, images_all, labels_all, jnp.asarray(idx), key)

    states, key, m = one_chunk(states, key)
    _ = float(m["loss"][0])
    n_chunks = max(1, args.steps // args.k)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        states, key, m = one_chunk(states, key)
    _ = float(m["loss"][0])
    per_step_mega = (time.perf_counter() - t0) / (n_chunks * args.k)

    print({
        "objective": f"ensemble{args.ensemble}" + ("+augmix" if args.augmix else ""),
        "batch": args.batch, "k": args.k, "steps": args.steps,
        "per_step_loop_ms": round(per_step * 1e3, 1),
        "megastep_ms_per_step": round(per_step_mega * 1e3, 1),
        "speedup": round(per_step / per_step_mega, 2),
        "loop_img_per_s": round(args.batch / per_step),
        "mega_img_per_s": round(args.batch / per_step_mega),
    })


def bench_kd(args, ds) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import index_iterator
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.distill import make_kd_step, make_kd_megastep
    from fav_tpu.models.uncertainty import init_ensemble

    t_mp = ModelParams()
    teacher = create_model(t_mp)
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    stacked = init_ensemble(teacher, jax.random.PRNGKey(0), sample, 5)
    widths = tuple(w // 2 for w in t_mp.widths)
    s_mp = ModelParams(widths=widths, dense_width=widths[-1])
    student_model = create_model(s_mp)
    tx = optax.adamw(1e-3)

    def fresh():
        st = student_model.init(jax.random.PRNGKey(3), sample)
        return st, tx.init(st)

    # per-step loop (numpy batch -> H2D per step)
    student, opt_state = fresh()
    step = make_kd_step(student_model.apply, teacher.apply, tx, 2.0, 0.3,
                        augmix=args.augmix)
    it = index_iterator(ds.train_images.shape[0], args.batch, seed=0)
    key = jax.random.PRNGKey(0)

    def one_step(student, opt_state, key):
        idx = next(it)
        key, sub = jax.random.split(key)
        return (*step(student, opt_state, stacked,
                      jnp.asarray(ds.train_images[idx]),
                      jnp.asarray(ds.train_labels[idx]), sub), key)

    for _ in range(3):
        student, opt_state, loss, key = one_step(student, opt_state, key)
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        student, opt_state, loss, key = one_step(student, opt_state, key)
    _ = float(loss)
    per_step = (time.perf_counter() - t0) / args.steps

    # megastep
    student, opt_state = fresh()
    mega = make_kd_megastep(student_model.apply, teacher.apply, tx, 2.0, 0.3,
                            augmix=args.augmix)
    images_all = jnp.asarray(ds.train_images)
    labels_all = jnp.asarray(ds.train_labels)
    it = index_iterator(ds.train_images.shape[0], args.batch, seed=0)
    key = jax.random.PRNGKey(0)

    def one_chunk(student, opt_state, key):
        idx = np.stack([next(it) for _ in range(args.k)]).astype(np.int32)
        return mega(student, opt_state, stacked, images_all, labels_all,
                    jnp.asarray(idx), key)

    student, opt_state, key, loss = one_chunk(student, opt_state, key)
    _ = float(loss)
    n_chunks = max(1, args.steps // args.k)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        student, opt_state, key, loss = one_chunk(student, opt_state, key)
    _ = float(loss)
    per_step_mega = (time.perf_counter() - t0) / (n_chunks * args.k)

    print({
        "objective": "kd+augmix" if args.augmix else "kd",
        "batch": args.batch, "k": args.k, "steps": args.steps,
        "per_step_loop_ms": round(per_step * 1e3, 1),
        "megastep_ms_per_step": round(per_step_mega * 1e3, 1),
        "speedup": round(per_step / per_step_mega, 2),
        "loop_img_per_s": round(args.batch / per_step),
        "mega_img_per_s": round(args.batch / per_step_mega),
    })


if __name__ == "__main__":
    main()
