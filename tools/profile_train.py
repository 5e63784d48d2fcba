"""Training roofline: attribute the train step's gap to bf16 peak (VERDICT #4).

Applies the megastep's own methodology to training: time each constituent of
the AugMix train step separately at serving-scale batch, compute achieved
FLOPs, and compare against the inference roofline (~75% of v5e bf16 peak).

Components timed (same compiled-program + D2H-barrier discipline as
bench.py):
  - augmix(images) alone               (input augmentation: 2 views)
  - forward only (3B trio)             (inference-shaped work)
  - forward+backward (value_and_grad)  (the 3x-FLOPs core)
  - full step (aug + fwd+bwd + adamw)  (what pretrain runs)
  - plain-CE full step                 (no-augmix baseline)

Usage: python tools/profile_train.py [--batch 4096] [--widths 64,128,256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, reps=5, barrier=None):
    """Median wall time of a jitted call; completion via D2H scalar fetch."""
    out = fn(*args)
    (barrier or (lambda o: float(o)))(out)  # warm + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        (barrier or (lambda o: float(o)))(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--widths", type=str, default="64,128,256")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import optax

    from fav_tpu.config import ModelParams
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.train import (
        TrainState,
        augmix_train_step,
        classifier_train_step,
    )
    from fav_tpu.ops.augment import augmix

    widths = tuple(int(w) for w in args.widths.split(","))
    mp = ModelParams(widths=widths, dense_width=widths[-1])
    model = create_model(mp)
    b = args.batch
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (b, 32, 32, 3), jnp.float32)
    y = jnp.zeros((b,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x[:1])
    tx = optax.adamw(1e-3)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    lam = jnp.float32(12.0)

    n_params = sum(p.size for p in jax.tree.leaves(params))
    # conv FLOPs per image (3x3 convs dominate): 2 * K * H*W * Cin * Cout
    h = w = 32
    flops = 0
    cin = 3
    for width in widths:
        for conv_i in range(3):
            flops += 2 * 9 * h * w * cin * width
            cin = width
        h, w = h // 2, w // 2
    flops += 2 * widths[-1] * widths[-1] + 2 * widths[-1] * 10
    print(f"model widths {widths}: {n_params/1e6:.2f} M params, "
          f"~{flops/1e6:.0f} MFLOP/img forward")

    # 1. augmix alone (one view)
    aug_j = jax.jit(lambda k, im: augmix(k, im))
    t_aug = _time(aug_j, key, x, barrier=lambda o: float(o[0, 0, 0, 0]))

    # 2. forward only on the 3B trio
    trio = jnp.concatenate([x, x, x], axis=0)
    fwd_j = jax.jit(lambda p, im: model.apply(p, im))
    t_fwd3 = _time(fwd_j, params, trio, barrier=lambda o: float(o[0, 0]))

    # 3. forward+backward on the trio-shaped loss (no optimizer)
    def loss_fn(p, im, lbl, k):
        logits = model.apply(p, im, train=True, rngs={"dropout": k})
        return optax.softmax_cross_entropy_with_integer_labels(logits[:b], lbl).mean()

    vg = jax.jit(jax.value_and_grad(loss_fn))
    t_bwd3 = _time(vg, params, trio, y, key, barrier=lambda o: float(o[0]))

    # 4. full AugMix step / 5. plain-CE step (fresh state per call family —
    # donated buffers mean we must rebuild state each timing run)
    def run_full(step_fn, *extra):
        # the step donates the state's buffers — every call needs fresh
        # copies or the global `params` would be invalidated
        def fresh():
            p = jax.tree.map(jnp.array, params)
            return TrainState(p, tx.init(p), jnp.zeros((), jnp.int32))

        _, m = step_fn(model.apply, tx, fresh(), x, y, key, *extra)  # warm
        float(m["loss"])
        ts = []
        for _ in range(5):
            st = fresh()
            float(jnp.sum(st.step))  # sync the copies out of the timing
            t0 = time.perf_counter()
            _, m = step_fn(model.apply, tx, st, x, y, key, *extra)
            float(m["loss"])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    t_full_aug = run_full(augmix_train_step, lam)
    t_full_ce = run_full(classifier_train_step)

    def row(name, t, n_img, mult):
        tf = flops * mult * n_img / t / 1e12
        print(f"{name:>28}: {t*1e3:8.1f} ms  {n_img/t:10.0f} img/s  "
              f"~{tf:6.1f} TFLOPs ({tf/197*100:4.1f}% of v5e bf16 peak)")

    print(f"batch {b}:")
    print(f"{'augmix (1 view)':>28}: {t_aug*1e3:8.1f} ms  {b/t_aug:10.0f} img/s")
    row("forward 3B", t_fwd3, 3 * b, 1)
    row("fwd+bwd 3B", t_bwd3, 3 * b, 3)
    row("FULL augmix step", t_full_aug, 3 * b, 3)
    row("FULL plain-CE step", t_full_ce, b, 3)
    print(f"  augmix-step overhead vs fwd+bwd: {(t_full_aug - t_bwd3)*1e3:.1f} ms "
          f"(2x augmix would be {2*t_aug*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
