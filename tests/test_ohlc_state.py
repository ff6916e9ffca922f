"""Mergeable OHLC candle state: merge law, resample parity, replay safety."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from commerce_sessionization_spark.operators.timeseries import (
    candles_from_state,
    merge_ohlc,
    ohlc_partial,
    ohlc_resample,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=dt.datetime(2024, 1, 1 + d, h, m),
                event_type=s,
                value=float(v),
            )
            for i, (d, h, m, s, v) in enumerate(rows)
        ]
    )


ROWS = [
    (0, 9, 0, "x", 10.0),
    (0, 9, 30, "x", 30.0),
    (0, 22, 0, "x", 5.0),
    (1, 1, 0, "x", 12.0),
    (0, 12, 0, "y", 7.0),
    (1, 12, 0, "y", 2.0),
]


def _canon(df):
    return sorted(map(tuple, df.collect()))


def test_partial_merge_equals_direct_any_split(spark):
    full = _ev(spark, ROWS)
    for cut in (1, 3, 5):
        a, b = _ev(spark, ROWS[:cut]), _ev(spark, ROWS[cut:])
        merged = merge_ohlc(
            ohlc_partial(a, "event_type"),
            ohlc_partial(b, "event_type"),
            "event_type",
        )
        assert _canon(candles_from_state(merged, "event_type")) == _canon(
            candles_from_state(ohlc_partial(full, "event_type"), "event_type")
        )


def test_finalized_state_matches_ohlc_resample(spark):
    full = _ev(spark, ROWS)
    state = candles_from_state(ohlc_partial(full, "event_type"), "event_type")
    direct = ohlc_resample(full, "event_type", order_cols=("event_id",))
    assert _canon(state) == _canon(direct)


def test_open_close_tiebreak_via_struct_order(spark):
    # same ts: struct ordering falls through to event_id, same as resample
    rows = [
        Row(event_id=2, ts=dt.datetime(2024, 1, 1, 9), event_type="x", value=7.0),
        Row(event_id=1, ts=dt.datetime(2024, 1, 1, 9), event_type="x", value=3.0),
    ]
    df = spark.createDataFrame(rows)
    c = candles_from_state(ohlc_partial(df, "event_type"), "event_type").collect()[0]
    assert (c.open, c.close) == (3.0, 7.0)


def test_incremental_writer_equals_direct_and_replay_safe(spark, tmp_path):
    from commerce_sessionization_spark.streaming.rollup_stream import (
        make_ohlc_writer,
        read_rollup_state,
    )

    out = str(tmp_path / "candles")
    write = make_ohlc_writer(spark, out)
    write(_ev(spark, ROWS[:3]), 0)
    write(_ev(spark, ROWS[3:]), 1)
    got = candles_from_state(read_rollup_state(spark, out), "event_type")
    direct = ohlc_resample(_ev(spark, ROWS), "event_type", order_cols=("event_id",))
    assert _canon(got) == _canon(direct)
    # crash-after-write-before-commit ⇒ epoch 1 re-delivered twice
    write(_ev(spark, ROWS[3:]), 1)
    write(_ev(spark, ROWS[3:]), 1)
    got2 = candles_from_state(read_rollup_state(spark, out), "event_type")
    assert _canon(got2) == _canon(direct)
