"""Capped sessionization (tier-b applyInPandas custom operator).

The no-cap configuration must be BYTE-IDENTICAL to the proven
window-function operator — that parity is the Pandas path's oracle.
The cap itself is pinned on a hand-computed timeline.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Row

from commerce_sessionization_spark.operators.sessions import (
    sessionize,
    sessionize_capped,
)
from commerce_sessionization_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_capped_without_cap_equals_window_operator(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id"
    )
    plain = {
        (r.event_id, r.session_id)
        for r in sessionize(ev, order_cols=("event_id",)).collect()
    }
    capped = {
        (r.event_id, r.session_id)
        for r in sessionize_capped(
            ev, cap_seconds=None, order_cols=("event_id",)
        ).collect()
    }
    assert plain == capped and len(plain) > 0


def _row(eid, minutes):
    return Row(
        event_id=eid,
        user_id=7,
        ts=datetime(2024, 1, 1) + timedelta(minutes=minutes),
    )


def test_cap_splits_marathon_session(spark):
    # 25-min gaps: the 30-min gap rule alone keeps all six in ONE session
    rows = [_row(i, 25 * i) for i in range(6)]
    df = spark.createDataFrame(rows)
    no_cap = sessionize_capped(df, cap_seconds=None, order_cols=("event_id",))
    assert no_cap.select("session_id").distinct().count() == 1
    # 60-min cap: events at 75' and 150' each exceed their running start
    capped = sessionize_capped(df, cap_seconds=3600, order_cols=("event_id",))
    got = {
        r.event_id: r.session_id
        for r in capped.collect()
    }
    # events at 75' and 100'/125' restart from the 75' boundary
    sessions = {}
    for eid, sid in got.items():
        sessions.setdefault(sid, []).append(eid)
    assert sorted(map(sorted, sessions.values())) == [[0, 1, 2], [3, 4, 5]]


def test_capped_is_deterministic(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id"
    )
    a = {
        (r.event_id, r.session_id)
        for r in sessionize_capped(ev, cap_seconds=3600).collect()
    }
    b = {
        (r.event_id, r.session_id)
        for r in sessionize_capped(ev, cap_seconds=3600).collect()
    }
    assert a == b
