"""A/B the int8 lowerings inside the full megastep (VERDICT #5).

Three pipelines, same 15-cell corruption megastep as bench.py, deployed
compact-student checkpoint:
  bf16      — flax forward (the shipped headline path)
  int8conv  — W8A8 via XLA's int8 conv lowering (round-2 result: 0.90x bf16)
  int8dot   — W8A8 via im2col + s8xs8->s32 dot_general (the 248-TOPS route)

Usage: python tools/bench_int8.py [--batch 6144] [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_CELLS = (
    ("gaussian_noise", 3), ("shot_noise", 3), ("impulse_noise", 3),
    ("defocus_blur", 3), ("glass_blur", 3), ("motion_blur", 3),
    ("zoom_blur", 3), ("snow", 3), ("frost", 3), ("fog", 3),
    ("brightness", 3), ("contrast", 3), ("elastic_transform", 3),
    ("pixelate", 3), ("jpeg_compression", 3),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6144)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.models.cnn import FailureAwareCNN
    from fav_tpu.models.quant import quantize_cnn, quantized_forward
    from fav_tpu.models.uncertainty import anomaly_from_confidence
    from fav_tpu.ops.corruptions_pallas import fast_corruption_fn as corruption_fn
    from fav_tpu.utils.checkpoint import restore_checkpoint

    ckpt = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "fav_tpu", "checkpoints", "student_compact")
    with open(os.path.join(ckpt, "metadata.json")) as f:
        meta = json.load(f)
    widths = tuple(meta["widths"])
    model = FailureAwareCNN(widths=widths, dense_width=meta["dense_width"])
    b = args.batch
    images = jax.random.uniform(jax.random.PRNGKey(0), (b, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), images[:1])
    variables, _ = restore_checkpoint(ckpt, variables)

    ds = load_cifar10()
    calib = jnp.asarray(ds.test_images[:512])
    q = quantize_cnn(variables, calib, widths)

    fns = [(corruption_fn(name), sev) for name, sev in BENCH_CELLS]

    def make_megastep(apply_fn):
        @jax.jit
        def megastep(images, key):
            keys = jax.random.split(key, len(fns))
            confs = []
            for (fn, sev), k in zip(fns, keys):
                corrupted = fn(k, images, sev)
                logits = apply_fn(corrupted)
                conf = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
                confs.append(jnp.mean(anomaly_from_confidence(conf)) + jnp.mean(conf))
            return jnp.stack(confs).mean()

        return megastep

    paths = {
        "bf16": make_megastep(lambda x: model.apply(variables, x)),
        "int8conv": make_megastep(lambda x: quantized_forward(q, x, "conv")),
        "int8dot": make_megastep(lambda x: quantized_forward(q, x, "im2col")),
    }

    results = {}
    k = jax.random.PRNGKey(2)
    for name, step in paths.items():
        for _ in range(2):
            k, sub = jax.random.split(k)
            out = step(images, sub)
        v_warm = float(out)  # D2H barrier (block_until_ready lies on the tunnel)
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.iters):
            k, sub = jax.random.split(k)
            out = step(images, sub)
            acc = out if acc is None else acc + out
        float(acc)
        dt = time.perf_counter() - t0
        ips = args.iters * b * len(fns) / dt
        results[name] = ips
        print(f"{name:>9}: {dt/args.iters*1e3:7.1f} ms/megastep  {ips:10.0f} img/s  "
              f"(sanity {v_warm:.3f})")
    print(f"int8dot vs bf16: {results['int8dot']/results['bf16']:.3f}x | "
          f"int8conv vs bf16: {results['int8conv']/results['bf16']:.3f}x")


if __name__ == "__main__":
    main()
