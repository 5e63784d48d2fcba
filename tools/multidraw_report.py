"""Cross-draw validation report: do the round-3 quality conclusions hold
beyond one synthetic data draw?

Reads the 15x5 grid JSONs produced by ``tools/run_multidraw.sh`` (draws 1..N,
``measurements/r4/drawN/grid_*.json``) plus the round-3 draw-0 grids
(``measurements/r3/eval_*.json``) and emits a markdown table + machine
verdicts for the three load-bearing claims (VERDICT r3 "next round" #1;
methodology anchor: the reference's evidence-backed behavior claims,
reference docs/system_notes.md:199-229):

1. **Leaderboard ordering** — occlusion training beats the deployed AugMix-KD
   student on corrupted accuracy.
2. **Failure-awareness contract** — the deployed student is *honest* where it
   is wrong (no confident-wrong grid cells), while the occlusion champions
   are not.
3. **Snow sev5 floor** — every model's snow-severity-5 accuracy is stuck
   (<0.30) regardless of recipe ("structural" claim, ROADMAP).
4. **Min-gate fixes honesty across draws** — the production preset's claim:
   the per-draw champion min-gated by that draw's independent student
   monitor (``evaluate --monitor``) has zero confident-wrong cells on every
   draw, including the draws where BOTH models' intrinsic confidence fails
   (GATED_SOURCES rows; operative confidence = min of the pair).

Usage: ``python tools/multidraw_report.py [--json OUT]``
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# draw -> model -> grid json (relative to repo root). Draw 0 is the original
# generator the round-3 conclusions were measured on; draws 1/2 change the
# generator seed AND recipe together (fav_tpu/data/cifar.py:DRAWS).
SOURCES: dict[int, dict[str, str]] = {
    0: {
        "student": "measurements/r3/eval_student_nano.json",
        "occl": "measurements/r3/eval_classifier_occl.json",
        "ensemble": "measurements/r4/draw0/grid_ensemble.json",
    },
    1: {
        "student": "measurements/r4/draw1/grid_student.json",
        "occl": "measurements/r4/draw1/grid_occl.json",
        "ensemble": "measurements/r4/draw1/grid_ensemble.json",
    },
    2: {
        "student": "measurements/r4/draw2/grid_student.json",
        "occl": "measurements/r4/draw2/grid_occl.json",
        "ensemble": "measurements/r4/draw2/grid_ensemble.json",
    },
}

# The production preset's cross-draw check (the follow-up to verdict 3 —
# single-model honesty does not replicate, so the deployment min-gates the
# predictor with an independent monitor), via ``evaluate --monitor``. Rows
# use the GATED operative confidence (min(predictor, monitor),
# sweep.py:auroc_gated). Two pairings per draw:
#   gated     — that draw's occl champion gated by its nano student
#   std_gated — that draw's standardized KD student (affine-veil-invariant
#               by construction, models/cnn.py:standardize_image) gated by
#               its nano student
GATED_SOURCES: dict[int, dict[str, str]] = {
    0: {
        "gated": "measurements/r4/draw0/grid_occl_gated.json",
        "std_gated": "measurements/r4/grid_std_gated.json",
    },
    1: {
        "gated": "measurements/r4/draw1/grid_occl_gated.json",
        "std_gated": "measurements/r4/draw1/grid_std_gated.json",
    },
    2: {
        "gated": "measurements/r4/draw2/grid_occl_gated.json",
        "std_gated": "measurements/r4/draw2/grid_std_gated.json",
    },
}

CONFIDENT_WRONG_ACC = 0.30   # a cell the model has effectively failed on...
CONFIDENT_WRONG_CONF = 0.60  # ...while still claiming this much confidence
SNOW_FLOOR = 0.30


def load_rows(sources=SOURCES, gated_sources=GATED_SOURCES):
    rows = {}
    for draw, models in sources.items():
        for model, rel in models.items():
            path = os.path.join(REPO, rel)
            if not os.path.isfile(path):
                continue
            g = json.load(open(path))
            cells = [c for corr in g["grid"].values() for c in corr.values()]
            snow5 = g["grid"]["snow"]["5"]
            cw = [
                c for c in cells
                if c["accuracy"] < CONFIDENT_WRONG_ACC
                and c["mean_confidence"] > CONFIDENT_WRONG_CONF
            ]
            rows[(draw, model)] = {
                "acc": g["summary"]["mean_corrupted_accuracy"],
                "auroc": g["summary"]["mean_failure_auroc"],
                "ece": g["summary"]["mean_ece"],
                "snow5_acc": round(snow5["accuracy"], 3),
                "snow5_conf": round(snow5["mean_confidence"], 3),
                "snow5_auroc": round(snow5["auroc"], 3),
                "confident_wrong_cells": len(cw),
                "source": rel,
            }
    for draw, pairings in gated_sources.items():
        if isinstance(pairings, str):  # legacy single-pairing form
            pairings = {"gated": pairings}
        for label, rel in pairings.items():
            path = os.path.join(REPO, rel)
            if not os.path.isfile(path):
                continue
            g = json.load(open(path))
            cells = [c for corr in g["grid"].values() for c in corr.values()]
            snow5 = g["grid"]["snow"]["5"]
            cw = [
                c for c in cells
                if c["accuracy"] < CONFIDENT_WRONG_ACC
                and c["mean_confidence_gated"] > CONFIDENT_WRONG_CONF
            ]
            rows[(draw, label)] = {
                "acc": g["summary"]["mean_corrupted_accuracy"],
                "auroc": round(
                    sum(c["auroc_gated"] for c in cells) / len(cells), 4),
                "ece": round(
                    sum(c["ece_gated"] for c in cells) / len(cells), 4),
                "snow5_acc": round(snow5["accuracy"], 3),
                "snow5_conf": round(snow5["mean_confidence_gated"], 3),
                "snow5_auroc": round(snow5["auroc_gated"], 3),
                "confident_wrong_cells": len(cw),
                "source": rel,
            }
    return rows


def verdicts(rows):
    draws = sorted({d for d, _ in rows})
    v = {}
    v["ordering_occl_beats_student"] = {
        d: rows[(d, "occl")]["acc"] > rows[(d, "student")]["acc"]
        for d in draws if (d, "occl") in rows and (d, "student") in rows
    }
    v["student_honest_everywhere"] = {
        d: rows[(d, "student")]["confident_wrong_cells"] == 0
        for d in draws if (d, "student") in rows
    }
    v["occl_confident_wrong_somewhere"] = {
        d: rows[(d, "occl")]["confident_wrong_cells"] > 0
        for d in draws if (d, "occl") in rows
    }
    v["gated_honest_everywhere"] = {
        d: rows[(d, "gated")]["confident_wrong_cells"] == 0
        for d in draws if (d, "gated") in rows
    }
    # the round-4 challenger pairing: standardized student predictor +
    # nano monitor — does it dominate the occl pairing (>= accuracy AND
    # <= confident-wrong cells) on every draw it was measured on?
    v["std_pair_dominates_occl_pair"] = {
        d: (rows[(d, "std_gated")]["acc"] >= rows[(d, "gated")]["acc"]
            and rows[(d, "std_gated")]["confident_wrong_cells"]
            <= rows[(d, "gated")]["confident_wrong_cells"])
        for d in draws
        if (d, "std_gated") in rows and (d, "gated") in rows
    }
    v["snow_floor_all_models"] = {
        d: all(
            rows[(d, m)]["snow5_acc"] < SNOW_FLOOR
            for m in ("student", "occl", "ensemble") if (d, m) in rows
        )
        for d in draws
    }
    return v


def markdown(rows, v):
    lines = [
        "| draw | model | acc | AUROC | ECE | snow5 acc | snow5 conf | "
        "snow5 AUROC | confident-wrong cells |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for (d, m), r in sorted(rows.items()):
        lines.append(
            f"| {d} | {m} | {r['acc']:.3f} | {r['auroc']:.3f} | "
            f"{r['ece']:.3f} | {r['snow5_acc']:.3f} | {r['snow5_conf']:.3f} | "
            f"{r['snow5_auroc']:.3f} | {r['confident_wrong_cells']} |"
        )
    lines.append("")
    for name, per_draw in v.items():
        status = ", ".join(f"draw{d}={'yes' if ok else 'NO'}"
                           for d, ok in per_draw.items())
        lines.append(f"- **{name}**: {status}")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", type=str, default=None)
    args = p.parse_args(argv)
    rows = load_rows()
    v = verdicts(rows)
    print(markdown(rows, v))
    out = {
        "rows": {f"draw{d}/{m}": r for (d, m), r in rows.items()},
        "verdicts": v,
        "thresholds": {
            "confident_wrong_acc": CONFIDENT_WRONG_ACC,
            "confident_wrong_conf": CONFIDENT_WRONG_CONF,
            "snow_floor": SNOW_FLOOR,
        },
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
        print(f"\njson -> {args.json}")
    return out


if __name__ == "__main__":
    main()
