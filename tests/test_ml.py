"""Closed-form distributed regression: planted-model recovery."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.ml import (
    apply_linear_model,
    fit_ridge_regression,
)


def _planted(spark, n=5000, noise=False):
    # deterministic pseudo-features from hashes; y = 3x1 - 2x2 + 0.5x3 + 7
    df = spark.range(0, n).selectExpr(
        "CAST(pmod(hash(id, 1), 1000) AS DOUBLE) / 100 AS x1",
        "CAST(pmod(hash(id, 2), 1000) AS DOUBLE) / 100 AS x2",
        "CAST(pmod(hash(id, 3), 1000) AS DOUBLE) / 100 AS x3",
        "CAST(pmod(hash(id, 9), 199) AS DOUBLE) / 995 AS eps",
    )
    y = 3 * F.col("x1") - 2 * F.col("x2") + 0.5 * F.col("x3") + 7
    if noise:
        y = y + F.col("eps")
    return df.withColumn("y", y)


def test_fit_recovers_planted_weights_exactly(spark):
    df = _planted(spark)
    w, b = fit_ridge_regression(df, ["x1", "x2", "x3"], "y")
    assert np.allclose(w, [3.0, -2.0, 0.5], atol=1e-8)
    assert b == pytest.approx(7.0, abs=1e-7)


def test_fit_matches_numpy_lstsq_under_noise(spark):
    df = _planted(spark, noise=True)
    w, b = fit_ridge_regression(df, ["x1", "x2", "x3"], "y")
    pdf = df.select("x1", "x2", "x3", "y").toPandas()
    X = np.column_stack([pdf[c] for c in ("x1", "x2", "x3")] + [np.ones(len(pdf))])
    ref, *_ = np.linalg.lstsq(X, pdf["y"].to_numpy(), rcond=None)
    assert np.allclose(w, ref[:-1], atol=1e-6) and b == pytest.approx(ref[-1], abs=1e-6)


def test_ridge_shrinks_weights_but_not_intercept_direction(spark):
    df = _planted(spark, noise=True)
    w0, _ = fit_ridge_regression(df, ["x1", "x2", "x3"], "y", l2=0.0)
    w1, _ = fit_ridge_regression(df, ["x1", "x2", "x3"], "y", l2=1e4)
    assert np.linalg.norm(w1) < np.linalg.norm(w0)


def test_apply_linear_model_is_columnar(spark):
    df = _planted(spark, n=100)
    w, b = fit_ridge_regression(df, ["x1", "x2", "x3"], "y")
    scored = apply_linear_model(df, ["x1", "x2", "x3"], w, b)
    resid = scored.select(
        F.max(F.abs(F.col("prediction") - F.col("y"))).alias("m")
    ).collect()[0]["m"]
    assert resid < 1e-7
