"""Instrument where fused_sweep wall-clock goes on the TPU (VERDICT #9).

Phases timed separately:
  1. trace+lower          (host, jax tracing of the 75-cell program)
  2. compile / cache load (tunnel compile or persistent-cache deserialize)
  3. execute #1           (first dispatch, D2H barrier = host scalar fetch)
  4. execute #2           (warm re-dispatch, same buffers)
  5. host assembly        (device_get + dict packing, measured inside)

Usage: python tools/profile_sweep.py [--num-images 2048] [--cells N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-images", type=int, default=2048)
    ap.add_argument("--corruptions", type=str, default="")
    ap.add_argument("--no-cache", action="store_true",
                    help="skip the persistent compile cache (A/B: is cache "
                         "deserialization slower than compiling?)")
    args = ap.parse_args()

    import jax

    if not args.no_cache:
        cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.models.cnn import create_model
    from fav_tpu.ops.corruptions import CORRUPTION_NAMES, SEVERITIES, corruption_fn
    from fav_tpu.parallel.sweep import _cell_metrics
    from fav_tpu.utils.checkpoint import restore_checkpoint

    ckpt = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "fav_tpu", "checkpoints", "student_compact")
    import json
    with open(os.path.join(ckpt, "metadata.json")) as f:
        meta = json.load(f)
    mp = ModelParams(arch=meta["arch"], widths=tuple(meta["widths"]),
                     dense_width=meta["dense_width"])
    model = create_model(mp)
    ds = load_cifar10()
    n = min(args.num_images, ds.test_images.shape[0])
    x = jnp.asarray(ds.test_images[:n])
    y = jnp.asarray(ds.test_labels[:n])
    params = model.init(jax.random.PRNGKey(0), x[:1])
    params, _ = restore_checkpoint(ckpt, params)
    temp = float(meta.get("temperature", 1.0))

    names = tuple(c for c in args.corruptions.split(",") if c) or CORRUPTION_NAMES
    cells = tuple((str(c), int(s)) for c in names for s in SEVERITIES)
    print(f"{len(cells)} cells x {n} images, model widths {meta['widths']}")

    def grid_fn(params, images, labels, key):
        stacked = {}
        for i, (name, sev) in enumerate(cells):
            k = jax.random.fold_in(key, i)
            corrupted = corruption_fn(name)(k, images, sev)
            logits = model.apply(params, corrupted)
            for m, v in _cell_metrics(logits, labels, temp).items():
                stacked.setdefault(m, []).append(v)
        return {m: jnp.stack(vs) for m, vs in stacked.items()}

    key = jax.random.PRNGKey(42)

    t0 = time.perf_counter()
    lowered = jax.jit(grid_fn).lower(params, x, y, key)
    t1 = time.perf_counter()
    print(f"trace+lower:       {t1 - t0:8.2f} s")

    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"compile/cacheload: {t2 - t1:8.2f} s")

    out = compiled(params, x, y, key)
    # completion barrier: D2H scalar fetch (block_until_ready returns early
    # on the tunneled backend, CLAUDE.md)
    _ = float(out["accuracy"][0])
    t3 = time.perf_counter()
    print(f"execute #1:        {t3 - t2:8.2f} s")

    out = compiled(params, x, y, key)
    _ = float(out["accuracy"][0])
    t4 = time.perf_counter()
    print(f"execute #2 (warm): {t4 - t3:8.2f} s")

    host = {m: jax.device_get(v).tolist() for m, v in out.items()}
    t5 = time.perf_counter()
    print(f"host D2H+assembly: {t5 - t4:8.2f} s ({len(host)} metrics x {len(cells)} cells)")
    print(f"TOTAL:             {t5 - t0:8.2f} s")


if __name__ == "__main__":
    main()
