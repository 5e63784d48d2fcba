"""Where does the headline megastep's time go? Interleaved A/B of the
bench.py pipeline split into its two stages.

Arms (each its own jitted program, iterations interleaved per the
same-session A/B rule in CLAUDE.md):

  full       — bench.py's exact megastep (15 corruption cells -> nano
               student forward -> packed scores)
  fwd_only   — identical program with the corruption transforms removed
               (model forwards on the clean batch, same 15x replication)
  corr_only  — corruption transforms only, packed mean of the corrupted
               pixels (no model)

corr_only + fwd_only will not sum to full (XLA fuses corruption into the
forward's first HBM read in the full program), but the ratios bound what a
bfloat16 corruption chain could buy: if full ~= fwd_only the pipeline is
forward-bound and corruption dtype work is pointless.

Usage: python tools/bench_corruption_share.py [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # reuse BENCH_CELLS / BATCH / checkpoint choice


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fav_tpu.config import ModelParams
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.uncertainty import anomaly_from_confidence
    from fav_tpu.ops.corruptions_pallas import fast_corruption_fn

    dev = jax.devices()[0]
    meta_path = os.path.join(benchmod.STUDENT_CKPT, "metadata.json")
    mp = ModelParams()
    if os.path.isfile(meta_path):
        meta = json.load(open(meta_path))
        mp = ModelParams(arch=meta.get("arch", "vgg"),
                         widths=tuple(meta.get("widths") or mp.widths),
                         dense_width=meta.get("dense_width") or mp.dense_width)
    model = create_model(mp)
    images = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(0), (benchmod.BATCH, 32, 32, 3), jnp.float32), dev)
    variables = model.init(jax.random.PRNGKey(1), images[:1])
    if os.path.isfile(meta_path):
        from fav_tpu.utils.checkpoint import restore_checkpoint
        variables, _ = restore_checkpoint(benchmod.STUDENT_CKPT, variables)
    variables = jax.device_put(variables, dev)

    fns = [(fast_corruption_fn(name), sev) for name, sev in benchmod.BENCH_CELLS]

    def scores(corrupted):
        logits = model.apply(variables, corrupted)
        conf = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
        return (jnp.mean(conf), jnp.mean(anomaly_from_confidence(conf)),
                jnp.mean((conf < 0.5).astype(jnp.float32)))

    @jax.jit
    def full(images, key):
        keys = jax.random.split(key, len(fns))
        cols = [scores(fn(k, images, sev)) for (fn, sev), k in zip(fns, keys)]
        return jnp.stack([jnp.stack(c).mean() for c in zip(*cols)])

    @jax.jit
    def fwd_only(images, key):
        del key
        cols = [scores(images) for _ in fns]
        return jnp.stack([jnp.stack(c).mean() for c in zip(*cols)])

    @jax.jit
    def corr_only(images, key):
        keys = jax.random.split(key, len(fns))
        outs = [jnp.mean(fn(k, images, sev)) for (fn, sev), k in zip(fns, keys)]
        return jnp.stack(outs).mean()[None]

    arms = {"full": full, "fwd_only": fwd_only, "corr_only": corr_only}
    k = jax.random.PRNGKey(2)
    for name, fn in arms.items():  # compile + warm
        out = fn(images, k)
        float(out[0])

    times = {name: [] for name in arms}
    for i in range(args.iters):  # interleaved
        for name, fn in arms.items():
            k, sub = jax.random.split(k)
            t0 = time.perf_counter()
            out = fn(images, sub)
            float(out[0])  # D2H barrier (block_until_ready lies on the tunnel)
            times[name].append(time.perf_counter() - t0)

    n_img = benchmod.BATCH * len(fns)
    result = {}
    for name, ts in times.items():
        ts = sorted(ts)[1:-1] or ts  # trim one outlier each side
        mean = sum(ts) / len(ts)
        result[name] = {"ms": round(mean * 1e3, 1),
                        "img_per_s": round(n_img / mean, 0)}
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
