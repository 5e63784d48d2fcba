"""Interleaved A/B: lane-packed vs unpacked glass/elastic Pallas kernels.

Round-5 occupancy fix (corruptions_pallas._glass_kernel_packed /
_elastic_kernel_packed): W=32 in the lane dim wasted 3/4 of every 128-lane
vreg. Arms run interleaved per the same-session A/B rule (CLAUDE.md —
tunnel throughput varies session to session); completion barrier is a
device-to-host scalar fetch (block_until_ready returns early on the
tunneled backend).

Usage: python tools/ab_packed_kernels.py [--batch 6144] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=6144)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fav_tpu.ops.corruptions_pallas import elastic_transform_pallas, glass_blur_pallas

    dev = jax.devices()[0]
    print(f"device: {dev.platform}", flush=True)
    x = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(0), (args.batch, 32, 32, 3), jnp.float32),
        dev,
    )
    key = jax.random.PRNGKey(3)
    seed = jnp.int32(3)

    arms = {}
    for sev in (3, 5):
        arms[f"glass_sev{sev}_packed"] = lambda s=sev: glass_blur_pallas(seed, x, s, packed=True)
        arms[f"glass_sev{sev}_unpacked"] = lambda s=sev: glass_blur_pallas(seed, x, s, packed=False)
        arms[f"elastic_sev{sev}_packed"] = lambda s=sev: elastic_transform_pallas(key, x, s, packed=True)
        arms[f"elastic_sev{sev}_unpacked"] = lambda s=sev: elastic_transform_pallas(key, x, s, packed=False)

    # warm (compile) every arm first
    for name, fn in arms.items():
        t0 = time.perf_counter()
        float(jnp.sum(fn()))
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    times: dict[str, list] = {n: [] for n in arms}
    for it in range(args.iters):
        for name, fn in arms.items():  # interleaved
            t0 = time.perf_counter()
            float(jnp.sum(fn()))  # D2H fetch = completion barrier
            times[name].append(time.perf_counter() - t0)

    report = {}
    for name, ts in times.items():
        ts = sorted(ts)
        report[name] = round(ts[len(ts) // 2] * 1e3, 2)  # median ms
    print(json.dumps({"batch": args.batch, "median_ms": report}, indent=2))
    return report


if __name__ == "__main__":
    main()
