"""Failure attribution + session logging tests (reference parity:
failure_attributor.py excursion semantics and cause priority;
session_logger.py 11-column CSV schema)."""

import csv
import io

from fav_tpu.core.attribution import EVENTS_CSV_HEADER, FailureAttributor, tick_cause
from fav_tpu.core.session_log import HEADER, SessionLogger


def _state(rel, status="VISION_OK", ml=False, integral=0.0):
    return {
        "reliability": rel,
        "vision_status": status,
        "ml_influence_active": ml,
        "anomaly_integral": integral,
        "policy_state": "VISION_ALLOWED",
        "trust_velocity": 0.0,
        "recovery_debt": 0.0,
        "recovery_coeff": 0.10,
        "contradiction_detected": False,
        "contradiction_count": 0,
        "timestamp": 0.0,
    }


def test_tick_cause_priority():
    assert tick_cause("VISION_CORRUPTED", False, 0.0) == "CORRUPTED"
    assert tick_cause("VISION_BLANK", False, 0.0) == "BLANK"
    assert tick_cause("VISION_FROZEN", False, 0.0) == "FROZEN"
    # ML_ANOMALY only when rules say OK and the integral is high
    assert tick_cause("VISION_OK", True, 0.6) == "ML_ANOMALY"
    assert tick_cause("VISION_OK", True, 0.4) == "NONE"
    assert tick_cause("VISION_OK", False, 0.9) == "NONE"


def test_excursion_lifecycle_and_dominant_cause():
    att = FailureAttributor()
    t = 0.0
    att.update(_state(0.9), t)  # above threshold: no excursion
    assert att.get_summary() == {"total_excursions": 0}
    # dip below 0.7 as FROZEN, deepen as CORRUPTED (higher priority wins)
    att.update(_state(0.6, "VISION_FROZEN"), 1.0)
    att.update(_state(0.3, "VISION_CORRUPTED"), 2.0)
    att.update(_state(0.2, "VISION_CORRUPTED"), 3.0)
    assert att.get_events() == []  # still open
    att.update(_state(0.8), 5.0)  # recovery closes it
    events = att.get_events()
    assert len(events) == 1
    e = events[0]
    assert e["cause"] == "CORRUPTED"  # dominance over FROZEN
    assert e["min_reliability"] == 0.2
    assert e["duration_s"] == 4.0
    summary = att.get_summary()
    assert summary["total_excursions"] == 1
    assert summary["by_cause"] == {"CORRUPTED": 1}
    assert summary["worst_reliability"] == 0.2


def test_multiple_excursions_and_csv():
    att = FailureAttributor()
    t = 0.0
    for start, cause in ((0.0, "VISION_FROZEN"), (10.0, "VISION_BLANK")):
        att.update(_state(0.5, cause), start)
        att.update(_state(0.9), start + 2.0)
    assert att.get_summary()["total_excursions"] == 2
    rows = list(csv.reader(io.StringIO(att.get_events_csv())))
    assert rows[0] == EVENTS_CSV_HEADER
    assert len(rows) == 3
    assert rows[1][3] == "FROZEN" and rows[2][3] == "BLANK"


def test_ml_anomaly_attribution():
    att = FailureAttributor()
    att.update(_state(0.5, "VISION_OK", ml=True, integral=0.8), 0.0)
    att.update(_state(0.9), 1.0)
    assert att.get_events()[0]["cause"] == "ML_ANOMALY"


def test_reset_clears_events():
    att = FailureAttributor()
    att.update(_state(0.5, "VISION_FROZEN"), 0.0)
    att.update(_state(0.9), 1.0)
    att.reset()
    assert att.get_events() == []
    assert att.get_summary() == {"total_excursions": 0}


def test_session_logger_schema():
    log = SessionLogger()
    log.log(_state(0.987654, "VISION_OK"), 0.0123)
    log.log(_state(0.5, "VISION_FROZEN"), 0.5)
    rows = list(csv.reader(io.StringIO(log.get_csv())))
    assert rows[0] == HEADER
    assert len(HEADER) == 11  # reference's 11-column evidence schema
    assert len(rows) == 3
    assert rows[1][1] == "0.987654"
    assert rows[1][3] == "0.012300"
    assert rows[2][5] == "VISION_FROZEN"
    assert log.entry_count == 2
    log.reset()
    assert log.entry_count == 0
    assert len(list(csv.reader(io.StringIO(log.get_csv())))) == 1


def test_session_replay_reproduces_and_detects_tampering(tmp_path):
    """Evidence replay (fav_tpu/tools/replay.py): a genuine session CSV
    reproduces within tolerance; a tampered row is flagged."""
    from fav_tpu.core.session_log import SessionLogger
    from fav_tpu.core.trust import TrustEngine
    from fav_tpu.tools import replay

    # deterministic clock so logged timestamps encode the exact dt
    t = [1000.0]

    def clock():
        return t[0]

    engine = TrustEngine(clock=clock)
    logger = SessionLogger()
    script = [("VISION_OK", 0.019)] * 60 + [("VISION_FROZEN", 0.01)] * 45 \
        + [("VISION_OK", 0.02)] * 90 + [("VISION_CORRUPTED", 0.08)] * 30 \
        + [("VISION_OK", 0.019)] * 120
    for status, score in script:
        t[0] += 1.0 / 30.0
        state = engine.update(status, score, 1.0 / 30.0)
        logger.log(state, score)

    result = replay.replay_csv(logger.get_csv())
    assert result["rows"] == len(script)
    assert all(v <= 5e-4 for v in result["max_dev"].values()), result

    # tamper with one reliability value mid-log
    lines = logger.get_csv().split("\r\n")
    cols = lines[100].split(",")
    cols[1] = f"{float(cols[1]) + 0.2:.6f}"
    lines[100] = ",".join(cols)
    tampered = replay.replay_csv("\r\n".join(lines))
    assert max(tampered["max_dev"].values()) > 0.1

    # CLI surface
    p = tmp_path / "session.csv"
    p.write_text(logger.get_csv())
    assert replay.main([str(p)]) == 0
    p.write_text("\r\n".join(lines))
    assert replay.main([str(p), "--tolerance", "1e-3"]) == 1


def test_session_replay_rejects_foreign_csv():
    import pytest

    from fav_tpu.tools import replay

    with pytest.raises(ValueError):
        replay.replay_csv("a,b,c\r\n1,2,3\r\n")
