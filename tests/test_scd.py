"""SCD Type-2 history: change collapse, range chaining, time travel."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import Row

from commerce_sessionization_spark.operators.scd import scd2_history, snapshot_asof


def _snaps(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, ts=dt.datetime(2024, 1, d), attr=a, seq=i)
         for i, (k, d, a) in enumerate(rows)]
    )


@pytest.fixture(scope="module")
def history(spark):
    rows = [
        (1, 1, "bronze"),
        (1, 3, "bronze"),   # unchanged → collapses into v1
        (1, 5, "silver"),   # change → v2
        (1, 9, "gold"),     # change → v3 (current)
        (2, 2, "bronze"),   # second key, single version
    ]
    return scd2_history(
        _snaps(spark, rows), key_cols=("k",), attr_cols=("attr",),
        ts_col="ts", order_cols=("seq",),
    )


def test_consecutive_unchanged_snapshots_collapse(history):
    rows = sorted(
        ((r["k"], r["version"], r["attr"]) for r in history.collect())
    )
    assert rows == [(1, 1, "bronze"), (1, 2, "silver"), (1, 3, "gold"),
                    (2, 1, "bronze")]


def test_ranges_chain_without_gaps_and_current_is_open(history):
    h = sorted(
        (r for r in history.collect() if r["k"] == 1),
        key=lambda r: r["version"],
    )
    for prev, nxt in zip(h, h[1:]):
        assert prev["effective_to"] == nxt["effective_from"]
    assert h[-1]["effective_to"] is None and h[-1]["is_current"]
    assert not any(r["is_current"] for r in h[:-1])


def test_snapshot_asof_time_travel(spark, history):
    at = dt.datetime(2024, 1, 6)  # between silver (day 5) and gold (day 9)
    got = {r["k"]: r["attr"] for r in snapshot_asof(history, at, ("k",)).collect()}
    assert got == {1: "silver", 2: "bronze"}
    # exactly at a boundary: the NEW version is in effect (from ≤ at < to)
    at_boundary = dt.datetime(2024, 1, 5)
    got2 = {r["k"]: r["attr"] for r in snapshot_asof(history, at_boundary, ("k",)).collect()}
    assert got2[1] == "silver"


def test_null_attribute_transitions_are_changes(spark):
    rows = _snaps(spark, [(1, 1, "a"), (1, 2, None), (1, 3, None), (1, 4, "a")])
    h = scd2_history(rows, ("k",), ("attr",), "ts", ("seq",))
    assert [r["attr"] for r in sorted(h.collect(), key=lambda r: r["version"])] \
        == ["a", None, "a"]
