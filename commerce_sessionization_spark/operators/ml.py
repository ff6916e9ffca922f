"""Distributed model fitting via sufficient statistics (north-star ML).

The pattern every scalable closed-form fit shares (and the one k-means
and the OLS-trend query already use): the 100 TB scan reduces to a tiny
mergeable state — here the normal-equation moments X'X (d×d) and X'y
(d) — and the driver solves the d-dimensional system with numpy, the
model-state pattern (d ≤ a few thousand; state is O(d²) floats,
independent of row count). One aggregation pass, map-side combinable,
no gradient iterations, no per-row Python.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_ridge_regression(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    l2: float = 0.0,
    fit_intercept: bool = True,
):
    """Closed-form (ridge) linear regression from ONE scan.

    Accumulates the upper triangle of X'X plus X'y as
    d(d+1)/2 + d + 1 plain double sums (an intercept is a constant-1
    feature), then solves (X'X + λI)w = X'y on the driver. The
    aggregate is map-side combinable — the only data movement is the
    1-row partial-state merge — so the fit costs exactly one pass at
    any scale. Double sums make the result order-dependent in the last
    ulps (unlike the engine's oracle-paired decimal queries); model
    fitting tolerates that, and tests pin recovery of planted weights
    to float tolerance instead of hashes.

    Returns ``(weights: np.ndarray[d], intercept: float)``; the
    intercept is 0.0 when ``fit_intercept=False``. λ is not applied to
    the intercept row (standard ridge convention).
    """
    cols = list(feature_cols)
    if not cols:
        raise ValueError("need at least one feature column")
    xs = [F.col(c).cast("double") for c in cols]
    if fit_intercept:
        xs = xs + [F.lit(1.0)]
    y = F.col(target_col).cast("double")
    d = len(xs)
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"xx_{i}_{j}"))
        aggs.append(F.sum(xs[i] * y).alias(f"xy_{i}"))
    row = df.agg(*aggs).collect()[0]
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            xtx[i, j] = xtx[j, i] = row[f"xx_{i}_{j}"]
        xty[i] = row[f"xy_{i}"]
    if l2:
        reg = np.eye(d) * float(l2)
        if fit_intercept:
            reg[d - 1, d - 1] = 0.0  # don't shrink the intercept
        xtx = xtx + reg
    w = np.linalg.solve(xtx, xty)
    if fit_intercept:
        return w[:-1], float(w[-1])
    return w, 0.0


def apply_linear_model(
    df: DataFrame,
    feature_cols: list[str],
    weights,
    intercept: float = 0.0,
    out_col: str = "prediction",
) -> DataFrame:
    """Score rows with a fitted linear model as a pure column expression
    (JVM-side, codegen): prediction = Σ wᵢ·xᵢ + b. The inference twin of
    ``fit_ridge_regression`` — broadcastable scalars, zero shuffles."""
    expr = F.lit(float(intercept))
    for c, w in zip(feature_cols, weights):
        expr = expr + F.col(c).cast("double") * F.lit(float(w))
    return df.withColumn(out_col, expr)
