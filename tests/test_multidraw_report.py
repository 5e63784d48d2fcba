"""Cross-draw validation report (tools/multidraw_report.py).

The tool aggregates per-draw 15x5 grid JSONs into the four load-bearing
verdicts (leaderboard ordering, single-model honesty, snow floor, gated
honesty — the reference's evidence-backed-claims methodology,
reference docs/system_notes.md:199-229). These tests feed it synthetic
grid files so every verdict path (yes / NO / missing source) is pinned
without touching the real measurement artifacts.
"""

from __future__ import annotations

import json

from tools.multidraw_report import load_rows, markdown, verdicts


def _cell(acc, conf, gated_conf=None):
    c = {
        "accuracy": acc,
        "mean_confidence": conf,
        "auroc": 0.8,
        "ece": 0.05,
    }
    if gated_conf is not None:
        c["mean_confidence_gated"] = gated_conf
        c["auroc_gated"] = 0.85
        c["ece_gated"] = 0.04
    return c


def _grid_json(path, acc, conf, snow5_acc, snow5_conf, gated_conf=None):
    # two corruptions x 5 severities is enough structure: the tool iterates
    # whatever names exist but requires grid["snow"]["5"]
    grid = {
        "snow": {str(s): _cell(acc, conf, gated_conf) for s in range(1, 6)},
        "fog": {str(s): _cell(acc, conf, gated_conf) for s in range(1, 6)},
    }
    grid["snow"]["5"] = _cell(snow5_acc, snow5_conf, gated_conf)
    doc = {
        "summary": {
            "mean_corrupted_accuracy": acc,
            "mean_failure_auroc": 0.8,
            "mean_ece": 0.05,
        },
        "grid": grid,
    }
    path.write_text(json.dumps(doc))


def test_verdicts_and_gated_rows(tmp_path):
    # draw 0: student honest (low conf where wrong), occl confidently wrong
    _grid_json(tmp_path / "s0.json", 0.73, 0.75, snow5_acc=0.13, snow5_conf=0.22)
    _grid_json(tmp_path / "o0.json", 0.75, 0.80, snow5_acc=0.15, snow5_conf=0.92)
    # draw 1: BOTH confidently wrong on snow5; the gate caps it to 0.3
    _grid_json(tmp_path / "s1.json", 0.60, 0.80, snow5_acc=0.10, snow5_conf=0.95)
    _grid_json(tmp_path / "o1.json", 0.65, 0.80, snow5_acc=0.12, snow5_conf=0.90,
               gated_conf=0.30)
    sources = {
        0: {"student": str(tmp_path / "s0.json"), "occl": str(tmp_path / "o0.json")},
        1: {"student": str(tmp_path / "s1.json"), "occl": str(tmp_path / "o1.json")},
    }
    gated = {1: str(tmp_path / "o1.json"), 2: str(tmp_path / "missing.json")}

    rows = load_rows(sources, gated)
    v = verdicts(rows)

    assert v["ordering_occl_beats_student"] == {0: True, 1: True}
    assert v["student_honest_everywhere"] == {0: True, 1: False}
    assert v["occl_confident_wrong_somewhere"] == {0: True, 1: True}
    # gated row: accuracy from the predictor grid, confidence from the
    # gated fields — capped at 0.3 so zero confident-wrong cells
    assert rows[(1, "gated")]["confident_wrong_cells"] == 0
    assert rows[(1, "gated")]["snow5_conf"] == 0.3
    assert v["gated_honest_everywhere"] == {1: True}
    # missing gated source for draw 2 -> silently absent, not an error
    assert (2, "gated") not in rows
    # snow floor: every present model under 0.30 on snow sev5
    assert v["snow_floor_all_models"] == {0: True, 1: True}

    md = markdown(rows, v)
    assert "| 1 | gated |" in md and "gated_honest_everywhere" in md


def test_confident_wrong_threshold_edges(tmp_path):
    # exactly AT the thresholds is NOT confident-wrong (strict inequalities)
    _grid_json(tmp_path / "s.json", 0.30, 0.60, snow5_acc=0.30, snow5_conf=0.60)
    rows = load_rows({0: {"student": str(tmp_path / "s.json")}}, {})
    assert rows[(0, "student")]["confident_wrong_cells"] == 0
