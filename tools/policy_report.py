"""Format the per-draw policy grids (tools/run_policy.sh outputs) into the
BENCH.md policy-space tables, including the mid-contrast question the
round-4 verdict left open (weak #6): does trust actually degrade on
contrast sev 2-4 streams, where binary L1 status stays OK but the
continuous anomaly rises?

Usage: python tools/policy_report.py [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SOURCES = {d: f"measurements/r5/policy_draw{d}.json" for d in range(5)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args(argv)

    report: dict = {"draws": {}, "contrast_2_4": {}}
    for d, rel in SOURCES.items():
        path = os.path.join(REPO, rel)
        if not os.path.isfile(path):
            report["draws"][d] = {"status": "missing"}
            continue
        with open(path) as f:
            doc = json.load(f)
        pol = doc["summary"]["policy"]
        grid = doc["grid"]
        # cells that stay fully ALLOWED while accuracy is destroyed — the
        # composed system's measured blind spot in policy space
        blind = [
            f"{n}/{s}"
            for n, sevs in grid.items()
            for s, c in sevs.items()
            if c["accuracy"] < 0.30 and c["policy_share_vision_allowed"] > 0.95
        ]
        report["draws"][d] = {
            "mean_share_allowed": pol["mean_share_vision_allowed"],
            "mean_share_blocked": pol["mean_share_vision_blocked"],
            "cells_blocked": pol["cells_blocked"],
            "never_blocked_low_acc": pol["never_blocked_low_acc_cells"],
            "mean_allowed_wrong_share": pol["mean_allowed_wrong_share"],
            "worst_allowed_wrong": pol["worst_allowed_wrong"][:3],
            "fully_allowed_low_acc": blind,
        }
        report["contrast_2_4"][d] = {
            s: {
                "accuracy": grid["contrast"][s]["accuracy"],
                "share_allowed": grid["contrast"][s]["policy_share_vision_allowed"],
                "share_blocked": grid["contrast"][s]["policy_share_vision_blocked"],
                "min_reliability": round(grid["contrast"][s]["min_reliability"], 4),
                "allowed_wrong": grid["contrast"][s]["allowed_wrong_share"],
            }
            for s in ("2", "3", "4")
            if "contrast" in grid
        }
    print(json.dumps(report, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
