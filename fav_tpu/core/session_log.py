"""Session logging — per-tick CSV evidence trail.

Parity target: ``platform/backend/session_logger.py`` (11-column schema,
session_logger.py:15-20). The format mirrors the ROS 2 system's
``vision_reliability_log.csv`` (docs/system_notes.md:230-249).
"""

from __future__ import annotations

import csv
import io
import time

HEADER = [
    "timestamp",
    "reliability",
    "policy_state",
    "anomaly",
    "anomaly_integral",
    "vision_status",
    "trust_velocity",
    "recovery_debt",
    "recovery_coeff",
    "contradiction_detected",
    "contradiction_count",
]


class SessionLogger:
    """In-memory CSV logger for reproducible trust-trajectory evidence."""

    HEADER = HEADER

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._buffer = io.StringIO()
        self._writer = csv.writer(self._buffer)
        self._writer.writerow(HEADER)
        self._count = 0

    def log(self, state: dict, anomaly_score: float) -> None:
        self._writer.writerow(
            [
                f"{state.get('timestamp', time.time()):.6f}",
                f"{state.get('reliability', 0):.6f}",
                state.get("policy_state", ""),
                f"{anomaly_score:.6f}",
                f"{state.get('anomaly_integral', 0):.6f}",
                state.get("vision_status", ""),
                f"{state.get('trust_velocity', 0):.6f}",
                f"{state.get('recovery_debt', 0):.4f}",
                f"{state.get('recovery_coeff', 0.10):.4f}",
                state.get("contradiction_detected", False),
                state.get("contradiction_count", 0),
            ]
        )
        self._count += 1

    def get_csv(self) -> str:
        return self._buffer.getvalue()

    @property
    def entry_count(self) -> int:
        return self._count
