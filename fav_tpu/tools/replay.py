"""Evidence replay: re-run a logged session through the trust engine.

The reference's methodology is "reproducibility and logging over demos" —
CSV evidence plus offline analysis (reference docs/system_notes.md:29,
230-257). This tool closes that loop: given an 11-column session CSV (the
``get_log`` download / :class:`fav_tpu.core.session_log.SessionLogger`
schema), it re-executes the pure trust recurrence on the logged inputs
(vision_status, anomaly, per-row dt from timestamps) and reports the maximum
deviation from the logged trajectory. A clean replay certifies the evidence
is self-consistent with the engine's dynamics; a divergence pinpoints
tampering, version drift, or a non-deterministic serving bug — with the
first offending row.

Usage::

    python -m fav_tpu.tools.replay session.csv [--tolerance 5e-4]

Exit code 0 when the trajectory reproduces within tolerance, 1 otherwise.
Prints one JSON line with the per-field max deviations.

The tolerance default is loose enough for the logged 6-decimal rounding
(reliability/integral/velocity print with ``%.6f``, debt/coeff with
``%.4f``) accumulated over state feedback, and tight enough that any real
divergence (a wrong decay constant, a skipped tick) blows through it.
"""

from __future__ import annotations

import argparse
import csv
import io
import json
import sys

from fav_tpu.config import TrustParams
from fav_tpu.core.session_log import HEADER
from fav_tpu.core.trust import TrustEngine


def replay_csv(text: str, params: TrustParams | None = None) -> dict:
    """Replay a session CSV; return deviation stats (see module docstring)."""
    rows = list(csv.DictReader(io.StringIO(text)))
    if not rows:
        return {"rows": 0, "ok": True, "max_dev": {}}
    missing = set(HEADER) - set(rows[0].keys())
    if missing:
        raise ValueError(f"not a session CSV; missing columns {sorted(missing)}")

    engine = TrustEngine(params or TrustParams())
    # per-row dt from timestamps; the first row's dt is unknowable from the
    # log (it ran from connection start), so seed it with the median gap
    ts = [float(r["timestamp"]) for r in rows]
    gaps = [b - a for a, b in zip(ts, ts[1:])] or [1.0 / 30.0]
    first_dt = sorted(gaps)[len(gaps) // 2]

    tracked = ("reliability", "anomaly_integral", "recovery_debt", "recovery_coeff")
    max_dev = {k: 0.0 for k in tracked}
    first_bad: dict | None = None
    for i, row in enumerate(rows):
        dt = first_dt if i == 0 else ts[i] - ts[i - 1]
        state = engine.update(row["vision_status"], float(row["anomaly"]), dt)
        for k in tracked:
            dev = abs(state[k] - float(row[k]))
            if dev > max_dev[k]:
                max_dev[k] = dev
                if first_bad is None and dev > 0.05:  # gross divergence marker
                    first_bad = {"row": i + 1, "field": k, "logged": float(row[k]), "replayed": state[k]}
    return {
        "rows": len(rows),
        "max_dev": {k: round(v, 8) for k, v in max_dev.items()},
        "first_gross_divergence": first_bad,
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    parser.add_argument("csv_path")
    parser.add_argument("--tolerance", type=float, default=5e-4,
                        help="max allowed per-field deviation (default 5e-4; "
                             "the first-row dt is estimated, so exact zero is "
                             "only achievable for fixed-dt playground logs)")
    args = parser.parse_args(argv)
    with open(args.csv_path, encoding="utf-8") as f:
        result = replay_csv(f.read())
    result["tolerance"] = args.tolerance
    result["ok"] = all(v <= args.tolerance for v in result["max_dev"].values())
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
