"""Time-series gapfill / OHLC: hand-computed semantics on tiny frames."""

from __future__ import annotations

from datetime import datetime

import pytest

from commerce_sessionization_spark.operators.timeseries import (
    ohlc_resample,
    time_bucket_gapfill,
)


def ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def series(spark):
    # series "a": values at hours 0, 1, 4 (gap at 2, 3); "b": hour 2 only
    rows = [
        (1, ts(0, 10), "a", 10.0),
        (2, ts(0, 40), "a", 20.0),
        (3, ts(1, 5), "a", 6.0),
        (4, ts(4, 30), "a", 18.0),
        (5, ts(2, 15), "b", 5.0),
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")


class TestGapfill:
    def test_dense_grid_and_values(self, series):
        out = time_bucket_gapfill(
            series, "event_type", ts_col="ts", value_col="value",
            bucket_seconds=3600,
        )
        rows = {(r.event_type, r.bucket_idx): r for r in out.collect()}
        # global range = hours 0..4 → 5 buckets × 2 series
        assert len(rows) == 10
        base = min(i for (_, i) in rows)
        a = [rows[("a", base + k)] for k in range(5)]
        assert [r.n_events for r in a] == [2, 1, 0, 0, 1]
        assert [r.v_sum for r in a] == [30.0, 6.0, None, None, 18.0]
        # LOCF carries 6.0 through the gap
        assert [r.locf_v for r in a] == [30.0, 6.0, 6.0, 6.0, 18.0]
        # linear interp between (idx1, 6.0) and (idx4, 18.0)
        assert a[2].interp_v == pytest.approx(6.0 + 12.0 * (1 / 3))
        assert a[3].interp_v == pytest.approx(6.0 + 12.0 * (2 / 3))
        # series b: single observation → LOCF forward, no interp outside
        b = [rows[("b", base + k)] for k in range(5)]
        assert [r.v_sum for r in b] == [None, None, 5.0, None, None]
        assert [r.locf_v for r in b] == [None, None, 5.0, 5.0, 5.0]
        assert [r.interp_v for r in b] == [None, None, 5.0, None, None]

    def test_grid_is_generated_not_scanned(self, series):
        """The dense grid must come from explode(sequence), no extra scan
        of the fact table beyond the bucket agg + bounds + distinct."""
        plan = time_bucket_gapfill(series, "event_type")._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Generate" in plan  # explode(sequence(...))


class TestOhlc:
    def test_candles(self, spark):
        rows = [
            (1, ts(9, 0), "x", 10.0),
            (2, ts(9, 30), "x", 30.0),
            (3, ts(10, 0), "x", 5.0),
            (4, ts(23, 59), "x", 12.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )
        out = ohlc_resample(
            df, "event_type", bucket_seconds=86400, order_cols=("event_id",)
        ).collect()
        assert len(out) == 1
        c = out[0]
        assert (c.open, c.high, c.low, c.close) == (10.0, 30.0, 5.0, 12.0)
        assert c.n_events == 4 and c.volume == 57.0

    def test_tiebreak_same_timestamp(self, spark):
        # two events at the identical ts: event_id decides open/close
        rows = [(2, ts(1), "x", 7.0), (1, ts(1), "x", 3.0)]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )
        c = ohlc_resample(df, "event_type", order_cols=("event_id",)).collect()[0]
        assert (c.open, c.close) == (3.0, 7.0)


class TestExpSmooth:
    def test_hand_computed_walk(self, spark):
        from commerce_sessionization_spark.operators.timeseries import exp_smooth

        # s1=100; s2=(200+3*100)//4=125; s3=(0+3*125)//4=93; s4=(93*3+50)//4=82
        rows = [("a", 1, 100), ("a", 2, 200), ("a", 3, 0), ("a", 4, 50),
                ("b", 1, 7)]
        df = spark.createDataFrame(
            rows, "event_type string, idx long, x_micro long"
        )
        got = {(r.event_type, r.idx): r.s_micro
               for r in exp_smooth(df, "event_type").collect()}
        assert got == {("a", 1): 100, ("a", 2): 125, ("a", 3): 93,
                       ("a", 4): 82, ("b", 1): 7}

    def test_alpha_one_is_identity(self, spark):
        from commerce_sessionization_spark.operators.timeseries import exp_smooth

        rows = [("x", i, v) for i, v in enumerate([5, 9, 1, 4], start=1)]
        df = spark.createDataFrame(
            rows, "event_type string, idx long, x_micro long"
        )
        out = exp_smooth(df, "event_type", alpha_num=1, alpha_den=1).collect()
        assert all(r.s_micro == r.x_micro for r in out)
