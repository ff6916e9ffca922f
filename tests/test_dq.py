"""Data-quality rules: each kind counts planted violations exactly."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.dq import (
    accepted_values,
    check_rules,
    foreign_key,
    in_range,
    not_null,
    unique,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            Row(id=1, k=10, status="ok", score=5.0),
            Row(id=2, k=None, status="ok", score=150.0),   # null k, high score
            Row(id=2, k=11, status="weird", score=-3.0),   # dup id, bad enum, low
            Row(id=3, k=12, status="ok", score=50.0),
            Row(id=3, k=99, status="ok", score=None),      # dup id, orphan k
        ]
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([Row(key=k) for k in (10, 11, 12)])


def _counts(df):
    return {r["rule"]: r["n_violations"] for r in df.collect()}


def test_each_rule_counts_planted_violations(spark, frame, dim):
    got = _counts(
        check_rules(
            frame,
            [
                not_null("k"),
                unique("id"),
                in_range("score", 0.0, 100.0),
                accepted_values("status", ["ok", "pending"]),
                foreign_key("k", dim, "key"),
            ],
        )
    )
    assert got["not_null(k)"] == 1
    assert got["unique(id)"] == 2  # ids 2 and 3 each appear twice
    assert got["in_range(score,0.0,100.0)"] == 2  # 150.0 and -3.0; NULL ignored
    assert got["accepted_values(status)"] == 1
    assert got["foreign_key(k)"] == 1  # 99 orphan; NULL ignored


def test_clean_frame_passes_everything(spark, dim):
    clean = spark.createDataFrame([Row(id=1, k=10), Row(id=2, k=11)])
    got = _counts(
        check_rules(clean, [not_null("k"), unique("id"), foreign_key("k", dim, "key")])
    )
    assert set(got.values()) == {0}


def test_empty_frame_counts_zero_not_null_rows(spark, frame, dim):
    empty = frame.limit(0)
    got = _counts(
        check_rules(empty, [not_null("k"), unique("id"), in_range("score", 0, 1)])
    )
    assert set(got.values()) == {0}


def test_observed_write_rides_the_materializing_job(spark):
    """Observation metrics accumulate inside the SAME job that writes the
    data — no second scan — and gate a publish step after the fact."""
    from commerce_sessionization_spark.operators.dq import observed_write

    df = spark.range(500).select(
        F.col("id"),
        F.when(F.col("id") % 50 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    obs_df, obs = observed_write(
        df,
        {
            "rows": F.count(F.lit(1)),
            "null_v": F.count(F.when(F.col("v").isNull(), 1)),
            "sum_id": F.sum("id"),
        },
    )
    obs_df.write.format("noop").mode("overwrite").save()
    assert obs.get == {"rows": 500, "null_v": 10, "sum_id": 499 * 500 // 2}


def test_observed_write_default_rowcount(spark):
    from commerce_sessionization_spark.operators.dq import observed_write

    obs_df, obs = observed_write(spark.range(7))
    obs_df.write.format("noop").mode("overwrite").save()
    assert obs.get == {"rows": 7}


def test_profile_columns_counts_nulls_and_ndv(spark):
    from pyspark.sql import Row

    from commerce_sessionization_spark.operators.dq import profile_columns

    df = spark.createDataFrame(
        [
            Row(a=1, b="x"),
            Row(a=1, b=None),
            Row(a=2, b="y"),
            Row(a=None, b="y"),
        ]
    )
    prof = {
        r.col_name: r
        for r in profile_columns(
            df, [("a", F.col("a")), ("b", F.col("b"))]
        ).collect()
    }
    assert prof["a"].n_rows == 4 and prof["a"].n_nulls == 1
    assert prof["a"].ndv == 2 and prof["a"].min_value == "1"
    assert prof["a"].max_value == "2"
    assert prof["b"].n_nulls == 1 and prof["b"].ndv == 2
    assert (prof["b"].min_value, prof["b"].max_value) == ("x", "y")


def test_profile_columns_approx_mode_close_and_expand_free(spark):
    import io
    import contextlib

    from commerce_sessionization_spark.operators.dq import profile_columns

    df = spark.range(0, 5000).selectExpr("id", "id % 37 AS m")
    cols = [("id", F.col("id")), ("m", F.col("m"))]
    approx = profile_columns(df, cols, approx_ndv=True)
    got = {r.col_name: r.ndv for r in approx.collect()}
    assert abs(got["id"] - 5000) / 5000 < 0.1
    assert abs(got["m"] - 37) <= 2
    # the approx plan must NOT pay the multi-distinct Expand
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        approx.explain(mode="formatted")
    assert "Expand" not in buf.getvalue()


class TestDataDriftPSI:
    def _df(self, spark, values, col="x"):
        return spark.createDataFrame(
            [(float(v),) if v is not None else (None,) for v in values],
            f"{col} double",
        )

    def test_identical_distributions_have_zero_psi(self, spark):
        from commerce_sessionization_spark.operators.dq import data_drift_psi

        vals = [float(i % 50) for i in range(1000)]
        r = data_drift_psi(
            self._df(spark, vals), self._df(spark, vals), ["x"]
        ).collect()[0]
        assert r.column == "x" and abs(r.psi) < 1e-9
        assert r.n_ref == r.n_cur == 1000

    def test_shifted_distribution_flags_drift(self, spark):
        from commerce_sessionization_spark.operators.dq import data_drift_psi

        ref = self._df(spark, [float(i % 50) for i in range(1000)])
        cur = self._df(spark, [float(i % 50) + 40 for i in range(1000)])
        r = data_drift_psi(ref, cur, ["x"]).collect()[0]
        assert r.psi > 0.25  # the standard "drifted" threshold

    def test_out_of_range_current_clamps_into_edge_bins(self, spark):
        from commerce_sessionization_spark.operators.dq import data_drift_psi

        ref = self._df(spark, range(100))
        cur = self._df(spark, [-1000.0] * 50 + [1000.0] * 50)
        r = data_drift_psi(ref, cur, ["x"]).collect()[0]
        # everything lands in the two edge bins: massive but finite PSI
        import math
        assert r.psi > 1.0 and math.isfinite(r.psi)

    def test_nulls_get_their_own_bin(self, spark):
        from commerce_sessionization_spark.operators.dq import data_drift_psi

        ref = self._df(spark, list(range(100)))
        cur = self._df(spark, list(range(50)) + [None] * 50)
        r = data_drift_psi(ref, cur, ["x"]).collect()[0]
        # a 50% null-rate regression must register as drift
        assert r.psi > 0.25
        assert r.n_cur == 100  # nulls counted, not dropped

    def test_multi_column_single_pass(self, spark):
        from commerce_sessionization_spark.operators.dq import data_drift_psi

        df = spark.createDataFrame(
            [(float(i), float(i * 2)) for i in range(200)], "a double, b double"
        )
        rows = data_drift_psi(df, df, ["a", "b"]).collect()
        assert {r.column for r in rows} == {"a", "b"}
        assert all(abs(r.psi) < 1e-9 for r in rows)

    def test_reference_bounds_computed_once(self, spark, monkeypatch):
        """ADVICE r8: data_drift_psi ran the reference melt+min/max agg
        twice (once per side). Pin the single-call contract."""
        import commerce_sessionization_spark.operators.dq as dq

        calls = []
        real = dq.drift_bounds

        def counting(ref, cols):
            calls.append(1)
            return real(ref, cols)

        monkeypatch.setattr(dq, "drift_bounds", counting)
        df = self._df(spark, range(100))
        r = dq.data_drift_psi(df, df, ["x"]).collect()[0]
        assert abs(r.psi) < 1e-9
        assert len(calls) == 1
