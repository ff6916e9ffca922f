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


class TestGapfillProperties:
    """Invariants on randomized series (pure-Python reference sweep)."""

    def test_randomized_invariants(self, spark):
        import random
        from datetime import datetime, timedelta

        rng = random.Random(77)
        base = datetime(2024, 3, 1)
        rows = []
        for i in range(120):
            rows.append(
                (
                    i,
                    base + timedelta(minutes=rng.randrange(0, 60 * 48)),
                    rng.choice(["p", "q", "r"]),
                    round(rng.uniform(0.01, 99.99), 2),
                )
            )
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )
        from commerce_sessionization_spark.operators.timeseries import (
            time_bucket_gapfill,
        )

        out = time_bucket_gapfill(df, "event_type").collect()
        by_series: dict[str, list] = {}
        for r in out:
            by_series.setdefault(r.event_type, []).append(r)
        idxs = sorted({r.bucket_idx for r in out})
        # dense: every series spans the identical contiguous global range
        assert idxs == list(range(min(idxs), max(idxs) + 1))
        for series, rs in by_series.items():
            rs.sort(key=lambda r: r.bucket_idx)
            assert [r.bucket_idx for r in rs] == idxs
            # conservation: filled sums equal the raw per-series total
            raw = sum(v for (_, ts, s, v) in rows if s == series)
            assert abs(sum(r.v_sum for r in rs if r.v_sum is not None) - raw) < 1e-6
            # LOCF equals the last observed sum at every position;
            # interp lies between its bracketing observations
            last = None
            for r in rs:
                if r.v_sum is not None:
                    last = r.v_sum
                assert r.locf_v == last
            obs = [(r.bucket_idx, r.v_sum) for r in rs if r.v_sum is not None]
            for r in rs:
                if r.v_sum is None and r.interp_v is not None:
                    prev = max((o for o in obs if o[0] < r.bucket_idx),
                               key=lambda o: o[0])
                    nxt = min((o for o in obs if o[0] > r.bucket_idx),
                              key=lambda o: o[0])
                    lo, hi = sorted((prev[1], nxt[1]))
                    assert lo - 1e-9 <= r.interp_v <= hi + 1e-9

    def test_exp_smooth_bounds_and_convergence(self, spark):
        from commerce_sessionization_spark.operators.timeseries import exp_smooth

        import random

        rng = random.Random(5)
        xs = [rng.randrange(0, 10**9) for _ in range(200)]
        rows = [("s", i + 1, x) for i, x in enumerate(xs)]
        # constant tail: the smoother must converge to the constant
        rows += [("s", len(xs) + 1 + j, 42_000_000) for j in range(120)]
        df = spark.createDataFrame(
            rows, "event_type string, idx long, x_micro long"
        )
        got = sorted(
            ((r.idx, r.s_micro) for r in exp_smooth(df, "event_type").collect())
        )
        lo, hi = min(x for _, _, x in rows), max(x for _, _, x in rows)
        assert all(lo <= s <= hi for _, s in got)  # bounded by input range
        # floor recurrence converges to within 3 of the constant
        assert abs(got[-1][1] - 42_000_000) <= 3


def _holt_ref(xs, an=1, ad=4, bn=1, bd=4):
    s = b = None
    out = []
    for x in xs:
        if s is None:
            s, b = int(x), 0
        else:
            prev = s
            s = (an * int(x) + (ad - an) * (s + b)) // ad
            b = (bn * (s - prev) + (bd - bn) * b) // bd
        out.append((s, b, s + b))
    return out


def test_holt_matches_reference_including_negative_trend(spark):
    from pyspark.sql import Row

    from commerce_sessionization_spark.operators.timeseries import holt_smooth

    # falling series: trend state goes NEGATIVE — the floor-division
    # regime where engines disagree unless handled
    xs = [1_000_000, 900_000, 700_000, 400_000, 350_000, 100_000]
    df = spark.createDataFrame(
        [Row(event_type="a", idx=i + 1, x_micro=x) for i, x in enumerate(xs)]
    )
    got = {
        r.idx: (r.s_micro, r.b_micro, r.forecast_micro)
        for r in holt_smooth(df, "event_type").collect()
    }
    want = {i + 1: t for i, t in enumerate(_holt_ref(xs))}
    assert got == want
    assert any(b < 0 for _, b, _ in want.values())  # the regime is exercised


def test_holt_tracks_linear_ramp(spark):
    """On a pure linear ramp the trend state must converge to the slope
    and the one-step forecast must track the next value closely."""
    from pyspark.sql import Row

    from commerce_sessionization_spark.operators.timeseries import holt_smooth

    slope = 50_000
    xs = [1_000_000 + slope * i for i in range(60)]
    df = spark.createDataFrame(
        [Row(event_type="r", idx=i + 1, x_micro=x) for i, x in enumerate(xs)]
    )
    rows = sorted(holt_smooth(df, "event_type").collect(), key=lambda r: r.idx)
    tail = rows[-1]
    assert abs(tail.b_micro - slope) < slope * 0.1
    assert abs(tail.forecast_micro - (xs[-1] + slope)) < slope * 2


def test_holt_multiseries_independence(spark):
    from pyspark.sql import Row

    from commerce_sessionization_spark.operators.timeseries import holt_smooth

    xs_a = [5, 10, 15, 20]
    xs_b = [100, 90, 80, 70]
    rows = [Row(event_type="a", idx=i + 1, x_micro=x) for i, x in enumerate(xs_a)]
    rows += [Row(event_type="b", idx=i + 1, x_micro=x) for i, x in enumerate(xs_b)]
    got = holt_smooth(spark.createDataFrame(rows), "event_type").collect()
    for series, xs in (("a", xs_a), ("b", xs_b)):
        sub = {r.idx: (r.s_micro, r.b_micro, r.forecast_micro)
               for r in got if r.event_type == series}
        assert sub == {i + 1: t for i, t in enumerate(_holt_ref(xs))}, series
