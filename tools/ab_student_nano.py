"""Same-session interleaved A/B of the headline megastep (bench.py) with
two student checkpoints: the deployed `student_compact` (widths 32/64/128)
vs the nano KD student (16/32/64, ~1/16 full-width forward FLOPs).

Deployment question this answers: the nano student measured a statistical
TIE on the full grid (0.730/0.806/ECE 0.077 vs 0.7317/0.810/0.076,
measurements/r3/eval_student_nano.json) and stays failure-aware on the snow
floor (sev5 conf 0.22) — so if the megastep is materially faster, the nano
model is the better deployment and bench.py's honest pipeline number rises.
Interleaved arms in ONE process per CLAUDE.md (tunnel throughput varies
session to session; a stale-baseline comparison once misread 1.6x).

Usage: python tools/ab_student_nano.py [--iters 6] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BATCH, BENCH_CELLS  # noqa: E402 — reuse the headline config


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=6, help="megasteps per timing")
    ap.add_argument("--rounds", type=int, default=3, help="interleaved rounds")
    ap.add_argument("--ckpt-a", default="fav_tpu/checkpoints/student_compact")
    ap.add_argument("--ckpt-b", default="fav_tpu/checkpoints/student_nano")
    args = ap.parse_args(argv)

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from fav_tpu.config import ModelParams
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.uncertainty import anomaly_from_confidence
    from fav_tpu.ops.corruptions_pallas import fast_corruption_fn as corruption_fn
    from fav_tpu.utils.checkpoint import restore_checkpoint

    dev = jax.devices()[0]
    images = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(0), (BATCH, 32, 32, 3), jnp.float32), dev
    )
    fns = [(corruption_fn(name), severity) for name, severity in BENCH_CELLS]

    def build(ckpt):
        with open(os.path.join(ckpt, "metadata.json")) as f:
            meta = json.load(f)
        mp = ModelParams(
            arch=meta.get("arch", "vgg"),
            widths=tuple(meta["widths"]),
            dense_width=meta["dense_width"],
        )
        model = create_model(mp)
        variables = model.init(jax.random.PRNGKey(1), images[:1])
        variables, _ = restore_checkpoint(ckpt, variables)
        variables = jax.device_put(variables, dev)

        @jax.jit
        def megastep(variables, images, key):
            keys = jax.random.split(key, len(fns))
            confs = []
            for (fn, severity), k in zip(fns, keys):
                corrupted = fn(k, images, severity)
                logits = model.apply(variables, corrupted)
                conf = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
                confs.append(jnp.mean(anomaly_from_confidence(conf)))
            return jnp.stack(confs).mean()

        return megastep, variables

    arms = {"compact": build(args.ckpt_a), "nano": build(args.ckpt_b)}
    key = jax.random.PRNGKey(2)
    # warm both (compile + cache)
    for name, (step, var) in arms.items():
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        float(step(var, images, sub))
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    times: dict[str, list] = {n: [] for n in arms}
    for r in range(args.rounds):
        for name, (step, var) in arms.items():
            key, sub = jax.random.split(key)
            acc = None
            t0 = time.perf_counter()
            for _ in range(args.iters):
                key, sub = jax.random.split(key)
                out = step(var, images, sub)
                acc = out if acc is None else acc + out
            float(acc)  # D2H completion barrier (tunnel backend)
            dt = (time.perf_counter() - t0) / args.iters
            times[name].append(dt)
            print(f"round {r} {name}: {dt * 1e3:.1f} ms/megastep "
                  f"({BATCH * len(fns) / dt / 1e3:.0f}k img/s)", flush=True)

    summary = {}
    for name, ts in times.items():
        med = statistics.median(ts)
        summary[name] = {
            "ms_per_megastep": round(med * 1e3, 1),
            "img_per_sec": round(BATCH * len(fns) / med, 0),
        }
    summary["speedup_nano_vs_compact"] = round(
        summary["compact"]["ms_per_megastep"] / summary["nano"]["ms_per_megastep"], 3
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
