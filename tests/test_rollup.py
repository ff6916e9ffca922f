"""Continuous-aggregate rollup: merge-law and state-shape tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from commerce_sessionization_spark.operators.rollup import (
    merge_rollups,
    time_bucket_rollup,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 1, 1, h, m), value=float(v)) for h, m, v in rows]
    )


def _canon(df):
    return sorted(
        (r["bucket_ts"], r["cnt"], str(r["sum_value"]), r["min_value"], r["max_value"])
        for r in df.collect()
    )


def test_merge_equals_direct_any_split(spark):
    rows = [(10, 5, 1.25), (10, 20, 2.5), (10, 59, 4.0), (11, 0, 8.0), (12, 30, 0.5)]
    full = _events(spark, rows)
    direct = time_bucket_rollup(full)
    for cut in (1, 2, 4):
        a = time_bucket_rollup(_events(spark, rows[:cut]))
        b = time_bucket_rollup(_events(spark, rows[cut:]))
        assert _canon(merge_rollups(a, b)) == _canon(direct)


def test_merge_is_associative_and_variadic(spark):
    rows = [(9, i, i + 0.5) for i in range(6)]
    parts = [
        time_bucket_rollup(_events(spark, rows[i : i + 2])) for i in (0, 2, 4)
    ]
    all_at_once = merge_rollups(*parts)
    nested = merge_rollups(merge_rollups(parts[0], parts[1]), parts[2])
    direct = time_bucket_rollup(_events(spark, rows))
    assert _canon(all_at_once) == _canon(nested) == _canon(direct)


def test_state_is_bucket_sized_not_event_sized(spark):
    rows = [(10, m % 60, 1.0) for m in range(50)]  # 50 events, one bucket
    state = time_bucket_rollup(_events(spark, rows))
    assert state.count() == 1
    r = state.collect()[0]
    assert r["cnt"] == 50 and float(r["sum_value"]) == 50.0
