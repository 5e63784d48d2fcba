"""Diagnose the weather-family robustness floor (fog/snow/frost, VERDICT #2).

Questions answered with measurements:
  1. Where do weather-corrupted predictions go? (prediction histogram /
     dominant-confusion per severity)
  2. What do fog/snow/frost do to image statistics vs what AugMix views
     cover? (luminance mean/std + low-frequency energy fraction, the axis
     the op set cannot express)
  3. Does the model's confidence stay honest there? (per-severity acc/conf)

Usage: python tools/diagnose_weather.py [--checkpoint DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def lowfreq_fraction(x):
    """Fraction of (non-DC) spectral energy in the lowest-frequency octave of
    the grayscale image — weather overlays live here."""
    import jax.numpy as jnp

    gray = jnp.mean(x, axis=-1)
    f = jnp.fft.fft2(gray)
    mag2 = jnp.abs(f) ** 2
    h, w = gray.shape[-2:]
    fy = jnp.minimum(jnp.arange(h), h - jnp.arange(h))[:, None]
    fx = jnp.minimum(jnp.arange(w), w - jnp.arange(w))[None, :]
    r = jnp.sqrt(fy**2 + fx**2)
    keep = (r > 0) & (r <= max(h, w) / 8)
    nondc = (r > 0)
    lo = jnp.sum(jnp.where(keep, mag2, 0.0), axis=(-2, -1))
    tot = jnp.sum(jnp.where(nondc, mag2, 0.0), axis=(-2, -1))
    return lo / jnp.maximum(tot, 1e-9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--num-images", type=int, default=2048)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from fav_tpu.config import ModelParams
    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.models.cnn import create_model
    from fav_tpu.ops.augment import augmix
    from fav_tpu.ops.corruptions import corruption_fn
    from fav_tpu.utils.checkpoint import DEFAULT_CKPT_DIR, restore_checkpoint

    ckpt = args.checkpoint or os.path.join(DEFAULT_CKPT_DIR, "classifier")
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

    @jax.jit
    def probe(params, x, y, key):
        out = {}
        # reference stats: clean + one augmix view
        views = {"clean": x, "augmix": augmix(key, x)}
        for fi, fam in enumerate(("fog", "snow", "frost", "gaussian_noise")):
            for sev in (1, 3, 5):
                k = jax.random.fold_in(key, fi * 10 + sev)
                views[f"{fam}_s{sev}"] = corruption_fn(fam)(k, x, sev)
        for name, v in views.items():
            probs = jax.nn.softmax(model.apply(params, v) / temp, axis=-1)
            conf = jnp.max(probs, axis=-1)
            preds = jnp.argmax(probs, axis=-1)
            hist = jnp.zeros(10).at[preds].add(1.0) / preds.shape[0]
            out[name] = {
                "acc": jnp.mean((preds == y).astype(jnp.float32)),
                "conf": jnp.mean(conf),
                "pred_hist": hist,
                "lum_mean": jnp.mean(v),
                "lum_std": jnp.mean(jnp.std(v.reshape(v.shape[0], -1), axis=1)),
                "lowfreq_frac": jnp.mean(lowfreq_fraction(v)),
            }
        return out

    res = jax.device_get(probe(params, x, y, jax.random.PRNGKey(42)))
    print(f"checkpoint={ckpt} n={n}")
    hdr = f"{'view':>18} {'acc':>6} {'conf':>6} {'lum_mu':>7} {'lum_sd':>7} {'lofreq':>7}  top-pred(frac)"
    print(hdr)
    for name, m in res.items():
        ph = m["pred_hist"]
        top = int(ph.argmax())
        print(f"{name:>18} {float(m['acc']):6.3f} {float(m['conf']):6.3f} "
              f"{float(m['lum_mean']):7.3f} {float(m['lum_std']):7.3f} "
              f"{float(m['lowfreq_frac']):7.3f}  class {top} ({float(ph[top]):.2f})")


if __name__ == "__main__":
    main()
