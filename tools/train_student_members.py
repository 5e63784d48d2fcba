"""Train bagged members of the *deployed* recipe: extra seeds of the
AugMix-manifold ensemble-KD compact student (`student_compact`, seed 0 —
BENCH.md Quality: best failure AUROC per FLOP and best calibration under
shift of any single-forward model).

Question this measures: does plain bagging (the recipe that stacked cleanly
for the occlusion classifier, BENCH.md round-3 leaderboard) survive a SHARED
teacher? All members distill from the same 5-member ensemble checkpoint, so
unlike the occl bag their soft-target supervision is common; diversity comes
only from student init, the shuffle stream, and the per-seed AugMix draws.
If the members decorrelate enough, a 5-student stack costs 5 x 1/4 = 1.25x
full-width FLOPs — the first candidate to be an accuracy champion AND
failure-aware at once.

Why one process: all seeds share the same KD-megastep program shapes, so
members 2-5 skip the tunnel compile entirely (persistent cache + in-process
executable reuse). Stack with tools/stack_ensemble.py.

Usage: python tools/train_student_members.py [--steps 3000] [--megastep 50]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--megastep", type=int, default=50)
    ap.add_argument("--seeds", type=str, default="1,2,3,4")
    ap.add_argument("--outdir", type=str, default="measurements/r3")
    args = ap.parse_args(argv)

    from fav_tpu.models import pretrain

    for seed in (int(s) for s in args.seeds.split(",")):
        out = os.path.join(args.outdir, f"student_m{seed}")
        print(f"=== student member seed {seed} -> {out}", flush=True)
        res = pretrain.main([
            "--distill-ensemble", "--augmix",
            "--steps", str(args.steps),
            "--megastep", str(args.megastep),
            "--seed", str(seed), "--out", out,
        ])
        print(f"seed {seed}: acc={res.get('accuracy')} "
              f"auroc={res.get('failure_auroc')}", flush=True)


if __name__ == "__main__":
    main()
