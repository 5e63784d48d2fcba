"""Interleaved same-process A/B of the scanline-shear implementations
inside the full augmix chain view (round-3 training-perf work).

Arms (all bitwise-identical outputs, tests/test_augment.py):
  windows  — the original (2M+2)-window select-accumulate rows + transposed cols
  barrel+T — barrel-shift rows, cols via transpose round trip
  barrel   — barrel-shift rows + direct axis-1 cols (current code)

Timings rotate round-robin to cancel tunnel drift (CLAUDE.md: throughput
varies session to session — never compare across runs).

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

    def cols_via_transpose(rows_impl):
        def _cols(xx, delta, m):
            return rows_impl(xx.transpose(0, 2, 1, 3), delta, m).transpose(0, 2, 1, 3)

        return _cols

    def cols_direct_axis1(xx, delta, max_shift):
        # the measured-negative variant (86.5 vs 83.9 ms): barrel shift
        # sliced along the sublane axis directly, no transpose round trip
        b, h, w, c = xx.shape
        m = int(max_shift)
        delta = jnp.clip(delta, -m, m - 1)
        lo = jnp.floor(delta).astype(jnp.int32)
        frac = (delta - lo)[:, None, :, None]
        off = lo + m
        nbits = max(1, int(2 * m - 1).bit_length())
        cur = jnp.pad(xx, ((0, 0), (m, (1 << nbits) - m), (0, 0), (0, 0)), mode="edge")
        for k in range(nbits):
            s = 1 << k
            bit = ((off >> k) & 1).astype(bool)[:, None, :, None]
            new_h = cur.shape[1] - s
            cur = jnp.where(bit, cur[:, s : s + new_h, :, :], cur[:, :new_h, :, :])
        return (1.0 - frac) * cur[:, :h, :, :] + frac * cur[:, 1 : h + 1, :, :]

    ARMS = {
        "windows rows + T cols": (
            A._shift_rows_windows,
            cols_via_transpose(A._shift_rows_windows),
        ),
        "barrel rows + T cols": (A._shift_rows, cols_via_transpose(A._shift_rows)),
        "barrel rows + direct cols": (A._shift_rows, cols_direct_axis1),
    }

    def run_with(rows_impl, cols_impl, fn, *fargs):
        saved = (A._shift_rows, A._shift_cols)
        A._shift_rows, A._shift_cols = rows_impl, cols_impl
        try:
            out = fn(*fargs)
            float(out.reshape(-1)[0])  # D2H completion barrier
        finally:
            A._shift_rows, A._shift_cols = saved
        return out

    compiled = {}
    for name, (ri, ci) in ARMS.items():
        fn = jax.jit(lambda k, im: A._chain(k, jnp.tile(im, (3, 1, 1, 1)), 0.25))
        run_with(ri, ci, fn, key, x)  # compile
        compiled[name] = fn

    times = {name: [] for name in ARMS}
    for _ in range(args.reps):
        for name, (ri, ci) in ARMS.items():
            t0 = time.perf_counter()
            run_with(ri, ci, compiled[name], key, x)
            times[name].append(time.perf_counter() - t0)

    wb = 3 * args.batch
    meds = {}
    for name, ts in times.items():
        ts.sort()
        meds[name] = ts[len(ts) // 2]
        print(f"{name:>28}: {meds[name] * 1e3:8.1f} ms  {wb / meds[name]:12.0f} img/s")
    base = meds["windows rows + T cols"]
    for name, m in meds.items():
        if name != "windows rows + T cols":
            print(f"{name} vs windows: {base / m:.2f}x")
