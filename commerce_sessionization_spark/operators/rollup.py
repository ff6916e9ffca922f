"""Continuous-aggregate rollups: time-bucketed partial aggregates that
merge across ingest batches (the hypertable / materialized-view
maintenance pattern).

At 100 TB you never re-aggregate history to refresh a dashboard: each
ingest batch folds into per-bucket partial state (count / decimal sum /
min / max — all associative+commutative), and merging two states is the
same tiny aggregation over O(buckets × keys) rows. The merge law
``merge(rollup(A), rollup(B)) == rollup(A ∪ B)`` is exact — sums
accumulate in DECIMAL so the law holds bit-for-bit, not approximately —
and the DuckDB oracle exploits it: the incremental two-batch plan is
hash-compared against a direct full-recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: partial-state columns produced per (bucket, *keys)
_STATE = ("cnt", "sum_value", "min_value", "max_value")


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Per-bucket partial aggregate: (bucket_ts, *keys, cnt, sum/min/max).

    ``sum_value`` stays DECIMAL(18,2) in the state (exact, order- and
    batch-independent); cast to double only when presenting. One map-side
    combinable aggregation — the shuffle carries per-bucket rows, not
    events.
    """
    return df.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"), *keys
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_value"),
        F.min(F.col(value_col)).alias("min_value"),
        F.max(F.col(value_col)).alias("max_value"),
    )


def merge_rollups(*states: DataFrame, keys: tuple[str, ...] = ()) -> DataFrame:
    """Fold any number of partial rollup states into one.

    union → one aggregation over state rows (count=Σcnt, sum=Σsum,
    min=min, max=max). Associative and commutative, so daily states fold
    into monthly, per-partition into global, in any order.
    """
    if not states:
        raise ValueError("need at least one rollup state")
    acc = states[0]
    for s in states[1:]:
        acc = acc.unionByName(s)
    return acc.groupBy("bucket_ts", *keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_value").cast("decimal(18,2)").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
