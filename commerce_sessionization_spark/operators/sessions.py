"""Generic gap-based sessionization over any (user, timestamp) event table.

The reference hard-wires sessionization to its behavior schema; this module
generalizes the same window-function formulation (lag-gap → boundary seed →
forward fill, cf. ``SessionizationBuiltIn.scala:68-113``) to arbitrary
columns and gap lengths, with µs-precision arithmetic and a collision-free
id preimage (``"{user}-{epoch_micros(session_start)}"`` — the reference's
second-rendered string preimage can collide for two sessions of one user
starting within the same second).

Everything is built-ins inside one window spec → a single shuffle on the
user column and whole-stage codegen throughout; no UDFs.

Scale notes: state per user is just the running session-start — WindowExec
sorts within each user partition and spills if needed. For skewed users at
100 TB, partition the input by a time bucket first and carry boundaries like
the hourly pipeline does, or use the streaming variant
(``streaming.sessionize_stream``) whose state store holds one row per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SECONDS = 30 * 60


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    order_cols: tuple[str, ...] = (),
    id_col: str = "session_id",
) -> DataFrame:
    """Assign a deterministic session id to every event.

    Events of one user ≤ ``gap_seconds`` apart share a session; larger gaps
    start a new one. ``order_cols`` breaks timestamp ties deterministically
    (pass the event's primary key).

    id = sha256("{user}-{epoch_micros(first event ts of the session)}").
    """
    order = [ts_col, *order_cols]
    w = Window.partitionBy(user_col).orderBy(*order)
    wfill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prev_ts = F.lag(ts_col, 1).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    is_boundary = prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000)

    session_start = F.last(
        F.when(is_boundary, F.col(ts_col)), ignorenulls=True
    ).over(wfill)
    session_id = F.sha2(
        F.concat_ws("-", F.col(user_col), F.unix_micros(session_start)), 256
    )
    return df.withColumn(id_col, session_id)


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "session_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session rollup: bounds, duration, event count, optional value sum.

    One hash-aggregation keyed by session id (partial map-side combine makes
    this shuffle-light: the reduced row count is #sessions, not #events).
    """
    aggs = [
        F.first(user_col).alias(user_col),
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1_000_000.0)
        ).alias("duration_sec"),
    ]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    return sessions.groupBy(id_col).agg(*aggs)
