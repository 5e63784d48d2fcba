"""Pre-registered held-out validation verdict (measurements/r5/preset_prereg.md).

Evaluates the three bars frozen BEFORE draws 3/4 were trained, exactly as
written, from the grid JSONs tools/run_heldout.sh produces. No thresholds or
metrics here may differ from the pre-registration (selection hygiene: the
whole point is that this file's criteria predate the data, VERDICT r4
missing #1; methodology anchor: reference docs/system_notes.md:199-229).

Part A (draws 3/4) bars, per draw, on the SHIPPED preset pairing
(std predictor + nano monitor, FAV_PRESET=gated):
  1. honesty:   <= 2 confident-wrong cells (accuracy < 0.30 at gated
                mean confidence > 0.60) under mean_confidence_gated
  2. gate earns its keep: mean(ece_gated) < mean(ece_self) over 75 cells
  3. accuracy margin: gated std+nano grid accuracy >=
                (same draw's occl+nano gated accuracy) - 0.035
VALIDATES iff all three hold on BOTH draws.

Part B (std2 arm, draws 0/1/2): std+std2 replaces the shipped monitor iff on
ALL three draws (a) confident-wrong cells <= std+nano's count AND
(b) gated grid-mean ECE < std+nano's.

Usage: python tools/heldout_verdict.py [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HELDOUT_DRAWS = (3, 4)

# Part B comparisons: draw -> (std+std2 grid, std+nano grid). The std+nano
# grids for draws 0/1/2 are the round-4 selection-time artifacts.
STD2_SOURCES = {
    0: ("measurements/r5/std2_draw0/grid_std_std2.json",
        "measurements/r4/grid_std_gated.json"),
    1: ("measurements/r5/std2_draw1/grid_std_std2.json",
        "measurements/r4/draw1/grid_std_gated.json"),
    2: ("measurements/r5/std2_draw2/grid_std_std2.json",
        "measurements/r4/draw2/grid_std_gated.json"),
}


def _load(rel):
    path = os.path.join(REPO, rel)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def _cells(grid_doc):
    for name, sevs in grid_doc["grid"].items():
        for sev, c in sevs.items():
            yield f"{name}/{sev}", c


def confident_wrong(grid_doc, conf_key="mean_confidence_gated"):
    """Pre-registered cell criterion: accuracy < 0.30 at operative
    confidence > 0.60 (tools/multidraw_report.py thresholds, frozen)."""
    out = []
    for cell, c in _cells(grid_doc):
        conf = c.get(conf_key, c["mean_confidence"])
        if c["accuracy"] < 0.30 and conf > 0.60:
            out.append({"cell": cell, "accuracy": round(c["accuracy"], 4),
                        "confidence": round(conf, 4)})
    return out


def grid_means(grid_doc, keys):
    cells = [c for _, c in _cells(grid_doc)]
    return {k: sum(c[k] for c in cells) / len(cells)
            for k in keys if all(k in c for c in cells)}


def part_a():
    draws = {}
    all_present = True
    for d in HELDOUT_DRAWS:
        base = f"measurements/r5/draw{d}"
        std_gated = _load(f"{base}/grid_std_gated.json")
        occl_gated = _load(f"{base}/grid_occl_gated.json")
        if std_gated is None or occl_gated is None:
            draws[d] = {"status": "grids missing"}
            all_present = False
            continue
        cw = confident_wrong(std_gated)
        means = grid_means(std_gated, ("ece_gated", "ece_self", "accuracy"))
        occl_acc = grid_means(occl_gated, ("accuracy",))["accuracy"]
        bar1 = len(cw) <= 2
        bar2 = means["ece_gated"] < means["ece_self"]
        bar3 = means["accuracy"] >= occl_acc - 0.035
        draws[d] = {
            "bar1_honesty": {"pass": bar1, "confident_wrong": cw},
            "bar2_gate_ece": {"pass": bar2,
                              "ece_gated": round(means["ece_gated"], 4),
                              "ece_self": round(means["ece_self"], 4)},
            "bar3_acc_margin": {"pass": bar3,
                                "acc_gated": round(means["accuracy"], 4),
                                "acc_occl_gated": round(occl_acc, 4),
                                "margin": round(means["accuracy"] - occl_acc, 4)},
            "all_bars": bar1 and bar2 and bar3,
        }
    verdict = (
        "INCOMPLETE" if not all_present
        else ("VALIDATES" if all(draws[d]["all_bars"] for d in HELDOUT_DRAWS)
              else "FAILS VALIDATION")
    )
    return {"verdict": verdict, "draws": draws}


def part_b():
    draws = {}
    all_present = True
    for d, (std2_rel, nano_rel) in STD2_SOURCES.items():
        std2 = _load(std2_rel)
        nano = _load(nano_rel)
        if std2 is None or nano is None:
            draws[d] = {"status": "grids missing"}
            all_present = False
            continue
        cw2 = confident_wrong(std2)
        cwn = confident_wrong(nano)
        e2 = grid_means(std2, ("ece_gated",))["ece_gated"]
        en = grid_means(nano, ("ece_gated",))["ece_gated"]
        draws[d] = {
            "a_confident_wrong": {"pass": len(cw2) <= len(cwn),
                                  "std2": len(cw2), "std_nano": len(cwn),
                                  "std2_cells": cw2},
            "b_ece": {"pass": e2 < en, "ece_std2": round(e2, 4),
                      "ece_std_nano": round(en, 4)},
        }
    if not all_present:
        return {"verdict": "INCOMPLETE", "draws": draws}
    wins = all(
        draws[d]["a_confident_wrong"]["pass"] and draws[d]["b_ece"]["pass"]
        for d in STD2_SOURCES
    )
    return {
        "verdict": "std2 REPLACES monitor (pending bars 1-3 on draws 3/4)"
        if wins else "arm CLOSES NEGATIVE",
        "draws": draws,
    }


def part_c():
    """Conditional stage (pre-registered): if part B wins on draws 0/1/2, the
    std+std2 pairing must ALSO pass part A's bars 1-3 on the held-out draws
    (per-draw std2 monitor, tools/run_heldout.sh C) before it may replace the
    shipped monitor. Bars identical to part A, on the std+std2 grids."""
    draws = {}
    all_present = True
    for d in HELDOUT_DRAWS:
        std2 = _load(f"measurements/r5/std2_draw{d}/grid_std_std2.json")
        occl_gated = _load(f"measurements/r5/draw{d}/grid_occl_gated.json")
        if std2 is None or occl_gated is None:
            draws[d] = {"status": "grids missing"}
            all_present = False
            continue
        cw = confident_wrong(std2)
        means = grid_means(std2, ("ece_gated", "ece_self", "accuracy"))
        occl_acc = grid_means(occl_gated, ("accuracy",))["accuracy"]
        bar1 = len(cw) <= 2
        bar2 = means["ece_gated"] < means["ece_self"]
        bar3 = means["accuracy"] >= occl_acc - 0.035
        draws[d] = {
            "bar1_honesty": {"pass": bar1, "confident_wrong": cw},
            "bar2_gate_ece": {"pass": bar2,
                              "ece_gated": round(means["ece_gated"], 4),
                              "ece_self": round(means["ece_self"], 4)},
            "bar3_acc_margin": {"pass": bar3,
                                "acc_gated": round(means["accuracy"], 4),
                                "acc_occl_gated": round(occl_acc, 4),
                                "margin": round(means["accuracy"] - occl_acc, 4)},
            "all_bars": bar1 and bar2 and bar3,
        }
    verdict = (
        "INCOMPLETE" if not all_present
        else ("std2 PASSES held-out bars — replacement allowed"
              if all(draws[d]["all_bars"] for d in HELDOUT_DRAWS)
              else "std2 FAILS held-out bars — shipped monitor stands")
    )
    return {"verdict": verdict, "draws": draws}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args(argv)
    report = {"part_a": part_a(), "part_b": part_b(), "part_c": part_c()}
    print(json.dumps(report, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
