"""Train the bagged-champion ensemble members: 4 extra seeds of the
rectangular-occlusion AugMix recipe (the best single classifier on the
grid, BENCH.md Quality — `classifier_occl`, seed 0).

Why one process: all seeds share the same megastep program shapes, so
members 2-5 skip the tunnel compile entirely (persistent cache + in-process
executable reuse). Stack the results with tools/stack_ensemble.py into a
homogeneous-recipe bagged ensemble — plain bagging of the champion recipe,
sidestepping the measured JS-correlation failure of --augmix ensembles
(members here never share a consistency term; diversity comes from init
seed AND an independent shuffle stream per seed).

Usage: python tools/train_occl_members.py [--steps 3000] [--megastep 50]
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
        out = os.path.join(args.outdir, f"occl_m{seed}")
        print(f"=== member seed {seed} -> {out}", flush=True)
        res = pretrain.main([
            "--occlude", "--steps", str(args.steps),
            "--megastep", str(args.megastep),
            "--seed", str(seed), "--out", out,
        ])
        print(f"seed {seed}: acc={res.get('accuracy')} "
              f"auroc={res.get('failure_auroc')}", flush=True)


if __name__ == "__main__":
    main()
