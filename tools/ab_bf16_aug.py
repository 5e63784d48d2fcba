"""Interleaved same-process A/B of f32 vs bf16 AugMix (round-3 training
perf: the train step's measured missing third is the augmentation's
memory-bound VPU work, BENCH.md Training — bf16 halves its HBM bytes).

Arms, timed round-robin to cancel tunnel drift (CLAUDE.md):
  view  — one augmix() call at the train-step batch, f32 vs bf16 chain
  step  — the full AugMix megastep (make_train_megastep, K scanned
          optimizer steps, dataset resident), bf16_aug off vs on

Usage: python tools/ab_bf16_aug.py [--batch 4096] [--reps 7] [--k 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import index_iterator, synthetic_cifar10
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.train import create_train_state, make_train_megastep
    from fav_tpu.ops.augment import augmix

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (args.batch, 32, 32, 3), jnp.float32)

    # ── arm 1: the augmix view ──
    view = {
        "view f32": jax.jit(lambda k, im: augmix(k, im)),
        "view bf16": jax.jit(lambda k, im: augmix(k, im, bf16=True)),
    }
    for fn in view.values():
        float(fn(key, x).reshape(-1)[0])  # compile
    vtimes = {n: [] for n in view}
    for _ in range(args.reps):
        for n, fn in view.items():
            t0 = time.perf_counter()
            float(fn(key, x).reshape(-1)[0])  # D2H barrier
            vtimes[n].append(time.perf_counter() - t0)

    # ── arm 2: the full AugMix megastep ──
    ds = synthetic_cifar10()
    model = create_model(ModelParams())
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    images_all = jnp.asarray(ds.train_images)
    labels_all = jnp.asarray(ds.train_labels)

    arms = {}
    for name, bf in (("step f32", False), ("step bf16", True)):
        params = model.init(jax.random.PRNGKey(1), sample)
        state, tx = create_train_state(params, 1e-3)
        mega = make_train_megastep(model.apply, tx, augmix=True, bf16_aug=bf)
        it = index_iterator(ds.train_images.shape[0], args.batch, seed=0)
        arms[name] = [state, tx, mega, it, jax.random.PRNGKey(0)]

    def one_chunk(name):
        state, tx, mega, it, k = arms[name]
        idx = np.stack([next(it) for _ in range(args.k)]).astype(np.int32)
        state, k, m = mega(state, images_all, labels_all, jnp.asarray(idx), k)
        arms[name][0], arms[name][4] = state, k
        float(m["loss"])  # barrier

    for name in arms:
        one_chunk(name)  # compile
    stimes = {n: [] for n in arms}
    for _ in range(args.reps):
        for name in arms:
            t0 = time.perf_counter()
            one_chunk(name)
            stimes[name].append((time.perf_counter() - t0) / args.k)

    def med(ts):
        ts = sorted(ts)
        return ts[len(ts) // 2]

    print(f"batch {args.batch}, reps {args.reps}, megastep K={args.k}")
    for n, ts in vtimes.items():
        print(f"{n:>10}: {med(ts) * 1e3:7.1f} ms  {args.batch / med(ts):10.0f} img/s")
    print(f"view bf16 speedup: {med(vtimes['view f32']) / med(vtimes['view bf16']):.2f}x")
    for n, ts in stimes.items():
        print(f"{n:>10}: {med(ts) * 1e3:7.1f} ms/step  {args.batch / med(ts):10.0f} img/s")
    print(f"step bf16 speedup: {med(stimes['step f32']) / med(stimes['step bf16']):.2f}x")
