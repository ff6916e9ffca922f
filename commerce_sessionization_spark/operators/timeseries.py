"""Time-series resampling: dense gap-filled buckets, LOCF, interpolation, OHLC.

The hypertable-style surface (TimescaleDB ``time_bucket_gapfill`` /
``locf`` / ``interpolate``; pandas ``resample().ohlc()``) re-expressed as
declarative Spark plans:

- ``time_bucket_gapfill`` — bucket a (series, ts, value) stream, then
  densify each series over the *global* bucket range with
  ``sequence + explode`` (generated, not scanned), left-join the real
  buckets back, and derive last-observation-carried-forward and linear
  interpolation from four ignore-nulls window passes over ONE window
  partitioning.
- ``ohlc_resample`` — per-bucket open/high/low/close/volume. Open/close
  come from row_number under the (ts, tiebreak) total order; the window
  and the final groupBy share the same key, so Catalyst reuses a single
  exchange.

Scale: a series' dense timeline is bounded by the time range, not the
row count — partitioning by series key keeps each window partition at
(range / bucket) rows regardless of corpus size. The grid is generated
per series key (no driver collect); the left join shuffles on
(series, bucket), the same key every downstream op reuses.

Determinism (cross-engine oracle): bucket sums accumulate in DECIMAL
(order-free); interpolation is the single IEEE expression
``prev + (next - prev) * ((i - pi) / (ni - pi))`` evaluated on identical
operands in both engines, then floor-quantized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket_gapfill(
    df: DataFrame,
    series_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Dense per-series buckets with count, exact sum, LOCF, and interpolation.

    Output: ``(series_col, bucket_idx, n_events, v_sum, locf_v, interp_v)``
    where ``bucket_idx`` is epoch-seconds // bucket_seconds, ``v_sum`` is
    the exact-decimal bucket sum cast to double (NULL for empty buckets),
    ``locf_v`` carries the last seen sum forward, and ``interp_v``
    linearly interpolates empty buckets between two observed ones
    (NULL before the first / after the last observation).
    """
    idx = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)).cast(
        "long"
    )
    buckets = (
        df.select(F.col(series_col), idx.alias("bucket_idx"), F.col(value_col))
        .groupBy(series_col, "bucket_idx")
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_v_dec"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    # Global bucket range: one broadcast row; the per-series grid is
    # GENERATED (sequence+explode), never scanned or collected.
    bounds = df.agg(
        F.min(idx).alias("_lo"), F.max(idx).alias("_hi")
    )
    grid = (
        df.select(series_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            series_col,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket_idx"),
        )
    )
    j = grid.join(buckets, [series_col, "bucket_idx"], "left")

    w_prev = (
        Window.partitionBy(series_col)
        .orderBy("bucket_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(series_col)
        .orderBy("bucket_idx")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    observed_idx = F.when(F.col("_v_dec").isNotNull(), F.col("bucket_idx"))
    filled = j.select(
        series_col,
        "bucket_idx",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.col("_v_dec"),
        F.last("_v_dec", ignorenulls=True).over(w_prev).alias("_prev_v"),
        F.last(observed_idx, ignorenulls=True).over(w_prev).alias("_prev_i"),
        F.first("_v_dec", ignorenulls=True).over(w_next).alias("_next_v"),
        F.first(observed_idx, ignorenulls=True).over(w_next).alias("_next_i"),
    )
    prev_d = F.col("_prev_v").cast("double")
    next_d = F.col("_next_v").cast("double")
    interp = F.when(F.col("_v_dec").isNotNull(), F.col("_v_dec").cast("double")).when(
        F.col("_prev_v").isNotNull() & F.col("_next_v").isNotNull(),
        prev_d
        + (next_d - prev_d)
        * (
            (F.col("bucket_idx") - F.col("_prev_i")).cast("double")
            / (F.col("_next_i") - F.col("_prev_i")).cast("double")
        ),
    )
    return filled.select(
        series_col,
        "bucket_idx",
        "n_events",
        F.col("_v_dec").cast("double").alias("v_sum"),
        F.col("_prev_v").cast("double").alias("locf_v"),
        interp.alias("interp_v"),
    )


def exp_smooth(
    df: DataFrame,
    series_col: str,
    idx_col: str = "idx",
    value_micro_col: str = "x_micro",
    alpha_num: int = 1,
    alpha_den: int = 4,
) -> DataFrame:
    """Per-series simple exponential smoothing in integer micro-units.

    ``s_1 = x_1;  s_t = (num·x_t + (den−num)·s_{t−1}) // den`` — the
    floor keeps every state an exact integer, so the recurrence replays
    bit-for-bit on any engine (a float EWMA would drift with summation
    order; an exact-decimal one overflows scale after ~30 steps). The
    per-step floor loses < 1 micro-unit per observation — noise at any
    realistic magnitude.

    A running recurrence is not window-expressible (each state feeds the
    next decision), so this is a tier-b operator: Arrow-batched
    ``applyInPandas`` per series key, sequential only WITHIN a series —
    throughput scales with series count, the same contract as
    ``pack_sequences``. The DuckDB oracle replays the walk with a
    recursive CTE, hash-checking the imperative path.

    Input needs dense per-series ``idx_col`` = 1..T (row_number over the
    time order) and NON-NEGATIVE integer ``value_micro_col`` (Python //
    floors, SQL // truncates — they agree only on non-negatives, and
    smoothed non-negative series stay non-negative). Output adds
    ``s_micro``.
    """
    import pandas as pd

    # key/index/value types follow the input (same fix as mmr_rerank,
    # ADVICE r8): hardcoding `string`/`long` broke non-string series
    # keys despite the configurable column names
    out_schema = ", ".join(
        [
            f"{series_col} {df.schema[series_col].dataType.simpleString()}",
            f"{idx_col} {df.schema[idx_col].dataType.simpleString()}",
            f"{value_micro_col} "
            f"{df.schema[value_micro_col].dataType.simpleString()}",
            "s_micro long",
        ]
    )
    num, den = alpha_num, alpha_den

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col).reset_index(drop=True)
        xs = pdf[value_micro_col].to_list()
        out = []
        s = None
        for x in xs:
            s = int(x) if s is None else (num * int(x) + (den - num) * s) // den
            out.append(s)
        pdf["s_micro"] = out
        return pdf[[series_col, idx_col, value_micro_col, "s_micro"]]

    return df.select(series_col, idx_col, value_micro_col).groupBy(
        series_col
    ).applyInPandas(smooth, schema=out_schema)


def ohlc_resample(
    df: DataFrame,
    series_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Per-(series, bucket) open/high/low/close/volume candles.

    Open/close are the first/last value under the (ts, *order_cols)
    total order — row_number in each direction, then conditional agg.
    The window and the groupBy share the (series, bucket) key: one
    exchange for the whole candle.
    """
    idx = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)).cast(
        "long"
    )
    base = df.select(
        F.col(series_col), idx.alias("bucket_idx"), F.col(ts_col), F.col(value_col),
        *[F.col(c) for c in order_cols],
    )
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w_asc = Window.partitionBy(series_col, "bucket_idx").orderBy(*order)
    w_desc = Window.partitionBy(series_col, "bucket_idx").orderBy(
        *[c.desc() for c in order]
    )
    ranked = base.select(
        series_col,
        "bucket_idx",
        value_col,
        F.row_number().over(w_asc).alias("_rn_a"),
        F.row_number().over(w_desc).alias("_rn_d"),
    )
    return ranked.groupBy(series_col, "bucket_idx").agg(
        F.max(F.when(F.col("_rn_a") == 1, F.col(value_col))).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max(F.when(F.col("_rn_d") == 1, F.col(value_col))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("volume"),
    )


# --------------------------------------------------------------------------
# Mergeable OHLC state (incremental / streaming candle maintenance)
# --------------------------------------------------------------------------

def ohlc_partial(
    df: DataFrame,
    series_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Per-(series, bucket) MERGEABLE candle state from one batch.

    open/close ride as min/max of a (ts, *order_cols, value) struct —
    struct ordering gives the earliest/latest event under the total
    order, and min/max is associative+commutative, so partial states
    from any batch split merge into the same candle
    (``merge_ohlc(ohlc_partial(A), ohlc_partial(B)) ==
    ohlc_partial(A ∪ B)`` — the continuous-aggregate contract that
    lets a stream maintain candles without reprocessing history).
    """
    idx = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)).cast(
        "long"
    )
    key = F.struct(
        F.col(ts_col).alias("_t"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
        F.col(value_col).alias("_v"),
    )
    return (
        df.select(
            F.col(series_col),
            idx.alias("bucket_idx"),
            key.alias("_k"),
            F.col(value_col),
        )
        .groupBy(series_col, "bucket_idx")
        .agg(
            F.min("_k").alias("first_evt"),
            F.max("_k").alias("last_evt"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("vol_dec"),
        )
    )


def merge_ohlc(a: DataFrame, b: DataFrame, series_col: str) -> DataFrame:
    """Merge two candle-state tables (same algebra as ``ohlc_partial``)."""
    return (
        a.unionByName(b)
        .groupBy(series_col, "bucket_idx")
        .agg(
            F.min("first_evt").alias("first_evt"),
            F.max("last_evt").alias("last_evt"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.sum("n_events").alias("n_events"),
            F.sum("vol_dec").alias("vol_dec"),
        )
    )


def candles_from_state(state: DataFrame, series_col: str) -> DataFrame:
    """Finalize candle state → the ``ohlc_resample`` output schema."""
    return state.select(
        series_col,
        "bucket_idx",
        F.col("first_evt._v").alias("open"),
        "high",
        "low",
        F.col("last_evt._v").alias("close"),
        "n_events",
        F.col("vol_dec").cast("double").alias("volume"),
    )


def holt_smooth(
    df: DataFrame,
    series_col: str,
    idx_col: str = "idx",
    value_micro_col: str = "x_micro",
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 4,
) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per series, in
    integer micro-units — level AND trend state:

        s_1 = x_1;  b_1 = 0
        s_t = ⌊(αn·x_t + (αd−αn)·(s_{t−1}+b_{t−1})) / αd⌋
        b_t = ⌊(βn·(s_t − s_{t−1}) + (βd−βn)·b_{t−1}) / βd⌋

    Unlike ``exp_smooth``'s level-only recurrence, the trend term (and
    a falling series' level) can go NEGATIVE, and Python ``//`` floors
    while SQL integer division truncates — so the oracle replays the
    divisions with an explicit floor form ((a − ((a%d + d)%d)) / d),
    keeping the walk bit-exact on any engine. Same tier-b contract as
    ``exp_smooth``: Arrow-batched per-series walk, sequential only
    within a series, recursive-CTE-replayable. Output adds ``s_micro``
    (level), ``b_micro`` (trend), and ``forecast_micro`` = s + b, the
    one-step-ahead Holt forecast.
    """
    import pandas as pd

    # key/index/value types follow the input (see exp_smooth)
    out_schema = ", ".join(
        [
            f"{series_col} {df.schema[series_col].dataType.simpleString()}",
            f"{idx_col} {df.schema[idx_col].dataType.simpleString()}",
            f"{value_micro_col} "
            f"{df.schema[value_micro_col].dataType.simpleString()}",
            "s_micro long",
            "b_micro long",
            "forecast_micro long",
        ]
    )
    an, ad, bn, bd = alpha_num, alpha_den, beta_num, beta_den

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col).reset_index(drop=True)
        xs = pdf[value_micro_col].to_list()
        ss, bs = [], []
        s = b = None
        for x in xs:
            if s is None:
                s, b = int(x), 0
            else:
                prev_s = s
                s = (an * int(x) + (ad - an) * (s + b)) // ad
                b = (bn * (s - prev_s) + (bd - bn) * b) // bd
            ss.append(s)
            bs.append(b)
        pdf["s_micro"] = ss
        pdf["b_micro"] = bs
        pdf["forecast_micro"] = [s_ + b_ for s_, b_ in zip(ss, bs)]
        return pdf[
            [series_col, idx_col, value_micro_col,
             "s_micro", "b_micro", "forecast_micro"]
        ]

    return df.select(series_col, idx_col, value_micro_col).groupBy(
        series_col
    ).applyInPandas(smooth, schema=out_schema)
