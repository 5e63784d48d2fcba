"""Interleaved same-process A/B: barrel-shift vs window select-accumulate
_shift_rows inside the full augmix view (round-3 training-perf work).

Both arms are the SAME augmix program except for the _shift_rows
implementation (bitwise-identical outputs, tests/test_augment.py); timings
alternate A/B/A/B to cancel tunnel drift (CLAUDE.md: throughput varies
session to session — never compare across runs).

Usage: python tools/ab_shift_rows.py [--batch 4096] [--reps 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from fav_tpu.ops import augment as A

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (args.batch, 32, 32, 3), jnp.float32)

    def make_view(shift_impl):
        saved = A._shift_rows
        A._shift_rows = shift_impl
        try:
            # fresh jit wrapper so each arm compiles its own program
            fn = jax.jit(
                lambda k, im: A._chain(k, jnp.tile(im, (3, 1, 1, 1)), 0.25)
            )
            out = fn(key, x)
            float(out.reshape(-1)[0])  # compile + completion barrier
        finally:
            A._shift_rows = saved
        return fn, shift_impl

    barrel = make_view(A._shift_rows)
    windows = make_view(A._shift_rows_windows)

    def once(fn, impl):
        saved = A._shift_rows
        A._shift_rows = impl
        try:
            t0 = time.perf_counter()
            out = fn(key, x)
            float(out.reshape(-1)[0])
            return time.perf_counter() - t0
        finally:
            A._shift_rows = saved

    tb, tw = [], []
    for _ in range(args.reps):
        tw.append(once(*windows))
        tb.append(once(*barrel))
    tb.sort(), tw.sort()
    mb, mw = tb[len(tb) // 2], tw[len(tw) // 2]
    wb = 3 * args.batch
    print(f"windows select-accumulate: {mw * 1e3:8.1f} ms  {wb / mw:12.0f} img/s")
    print(f"barrel shift             : {mb * 1e3:8.1f} ms  {wb / mb:12.0f} img/s")
    print(f"speedup: {mw / mb:.2f}x (chain view, batch {args.batch} x width 3)")
