"""The deprecated UDF sessionization path: parity where the reference
paths agree, divergence pinned where they genuinely differ (SURVEY §2.9
documents the bit-rot; these tests turn the prose into assertions)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.legacy import (
    augment_session_id_udf,
    filter_date_hour,
)
from commerce_sessionization_spark.operators.sessions import sessionize


def _events(spark, times, user=7):
    return spark.createDataFrame(
        [
            Row(user_id=user, event_time=t, event_type="view", price=float(i))
            for i, t in enumerate(times)
        ]
    )


def _segmentation(rows, id_field):
    """Canonical session shape: tuple of per-session event counts in
    time order — comparable across id-minting schemes."""
    sessions: dict[str, list] = {}
    for r in rows:
        sessions.setdefault(r[id_field], []).append(r["event_time"])
    return sorted(
        (min(ts), len(ts)) for ts in sessions.values()
    )


def test_udf_path_matches_builtin_segmentation_on_whole_seconds(spark):
    t0 = datetime(2019, 10, 1, 10, 0, 0)
    times = [
        t0,
        datetime(2019, 10, 1, 10, 10, 0),
        datetime(2019, 10, 1, 11, 0, 0),   # 50 min gap -> split
        datetime(2019, 10, 1, 11, 20, 0),
        datetime(2019, 10, 1, 12, 30, 0),  # 70 min gap -> split
    ]
    df = _events(spark, times)
    legacy = augment_session_id_udf(df).collect()
    builtin = sessionize(
        df.withColumnRenamed("event_time", "ts"), gap_seconds=1800,
        order_cols=("price",),
    ).withColumnRenamed("ts", "event_time").collect()
    assert _segmentation(legacy, "session_id") == _segmentation(
        builtin, "session_id"
    )
    # ids are sha256("{user}-{epochMillis}") — 64 hex chars, distinct per session
    assert all(len(r["session_id"]) == 64 for r in legacy)
    assert len({r["session_id"] for r in legacy}) == 3


def test_millisecond_threshold_is_pinned(spark):
    """The UDF path's gap unit is MILLISECONDS (1_800_000, strictly
    greater-than): 1800.000s holds the session, 1800.001s splits.
    The builtin path can never observe this regime — its stored
    event_time strings are whole-second ("yyyy-MM-dd HH:mm:ss 'UTC'"),
    asserted below — which is exactly why the reference's two paths
    diverge only latently (SURVEY §2.9 bit-rot note, now a test)."""
    t0 = datetime(2019, 10, 1, 10, 0, 0, 0)
    exactly = datetime(2019, 10, 1, 10, 30, 0, 0)        # +1800.000 s
    just_over = datetime(2019, 10, 1, 10, 30, 0, 1000)   # +1800.001 s
    hold = augment_session_id_udf(_events(spark, [t0, exactly])).collect()
    assert len({r["session_id"] for r in hold}) == 1
    split = augment_session_id_udf(_events(spark, [t0, just_over])).collect()
    assert len({r["session_id"] for r in split}) == 2

    # builtin input representation is second-granular: the stored-string
    # parse cannot carry fractions, so the sub-second regime is
    # unreachable on the production path
    from commerce_sessionization_spark.operators.sessionize import (
        with_event_timestamp,
    )

    parsed = with_event_timestamp(
        spark.createDataFrame(
            [Row(event_time="2019-10-01 10:30:00 UTC")]
        )
    ).collect()[0]["event_timestamp"]
    assert parsed.microsecond == 0


def test_udf_id_preimage_is_user_dash_epoch_millis(spark):
    import hashlib

    t0 = datetime(2019, 10, 1, 10, 0, 0)
    df = _events(spark, [t0], user=42)
    import calendar

    got = augment_session_id_udf(df).collect()[0]["session_id"]
    epoch_ms = calendar.timegm(t0.timetuple()) * 1000
    assert got == hashlib.sha256(f"42-{epoch_ms}".encode()).hexdigest()


def test_date_hour_filter_matches_rendered_string(spark):
    df = spark.createDataFrame(
        [
            Row(user_id=1, date_hour="2019-10-01T10Z", v=1),
            Row(user_id=2, date_hour="2019-10-01T11Z", v=2),
        ]
    )
    got = filter_date_hour(df, "2019-10-01", "10").collect()
    assert [r.user_id for r in got] == [1]
