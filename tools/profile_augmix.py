"""Attribute the AugMix view cost component by component (round 3).

The Pallas-affine A/B showed the affine select-accumulate is NOT the
bottleneck (augmix view ~105-109 ms either way at batch 12288) — so time
every constituent of fav_tpu.ops.augment.augmix at the train-step shape to
find where the ~100 ms actually goes before optimizing anything else.

Usage: python tools/profile_augmix.py [--batch 4096] [--width 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, reps=5):
    out = fn(*args)
    out = jax.tree.leaves(out)[0]
    float(out.reshape(-1)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.tree.leaves(fn(*args))[0]
        float(out.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--width", type=int, default=3)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from fav_tpu.ops import augment as A

    b = args.batch
    wb = args.width * b  # the replicated chain batch
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (b, 32, 32, 3), jnp.float32)
    xw = jax.random.uniform(key, (wb, 32, 32, 3), jnp.float32)
    mags = jax.random.uniform(jax.random.PRNGKey(1), (9, wb), jnp.float32)
    ys = (jnp.arange(32, dtype=jnp.float32) - 15.5)[None, :]

    rows = []

    def row(name, t, n=wb):
        rows.append((name, t * 1e3, n / t))

    # full augmix + the chain alone; the alpha=1+eps variant compiles the
    # gamma rejection samplers (XLA while_loops) the closed-form alpha=1
    # path eliminated — the round-3 mixing rewrite's A/B
    row("augmix (full, 1 view)", _time(jax.jit(lambda k, im: A.augmix(k, im)), key, x), b)
    row("augmix (gamma samplers)", _time(
        jax.jit(lambda k, im: A.augmix(k, im, alpha=1.0 + 1e-6)), key, x), b)
    chain_j = jax.jit(lambda k, im: A._chain(k, im, 0.25))
    row("_chain on width*B", _time(chain_j, key, xw))

    # geometry
    aff = jax.jit(lambda im, m: A._affine_scanline(
        im, m[0] * A._MAX_ROT, m[1] * A._MAX_SHEAR, m[2] * A._MAX_SHEAR,
        m[3] * A._MAX_TRANSLATE * 32, m[4] * A._MAX_TRANSLATE * 32))
    row("affine scanline (3 passes)", _time(aff, xw, mags))

    # pointwise family
    row("posterize", _time(jax.jit(A._posterize), xw, mags[5]))
    row("solarize", _time(jax.jit(A._solarize), xw, mags[6]))
    row("autocontrast", _time(jax.jit(A._autocontrast), xw, mags[7]))

    # samplers at augmix's own shapes
    d_j = jax.jit(lambda k: jax.random.dirichlet(
        k, jnp.full((args.width,), 1.0, jnp.float32), (b,), jnp.float32))
    row("dirichlet draw [B, width]", _time(d_j, key), b)
    b_j = jax.jit(lambda k: jax.random.beta(k, 1.0, 1.0, (b,), jnp.float32))
    row("beta draw [B]", _time(b_j, key), b)
    u_j = jax.jit(lambda k: jax.random.uniform(k, (9, wb), jnp.float32))
    row("uniform draw [9, width*B]", _time(u_j, key), b)

    # mixing tail: tile + einsum + blend
    def tail(k, im):
        ws = jax.random.dirichlet(k, jnp.full((args.width,), 1.0), (b,), jnp.float32)
        blend = jax.random.beta(k, 1.0, 1.0, (b,), jnp.float32)[:, None, None, None]
        rep = jnp.tile(im, (args.width, 1, 1, 1)).reshape((args.width, b) + im.shape[1:])
        mix = jnp.einsum("bw,wbhxc->bhxc", ws, rep)
        return jnp.clip(blend * im + (1 - blend) * mix, 0.0, 1.0)

    row("samplers+tile+einsum tail", _time(jax.jit(tail), key, x), b)

    for name, ms, ips in rows:
        print(f"{name:>30}: {ms:8.1f} ms  {ips:12.0f} img/s")
