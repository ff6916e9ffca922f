"""Ingest: raw CSV → hourly hive-partitioned parquet (SURVEY §3 EP2).

Mirrors ``DailyFileDivider.scala``: read the monthly behavior CSV with an
explicit schema, derive the partition columns from the event time, cluster
by partition key, and dynamic-overwrite the ``logs`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.sessionize import EVENT_TIME_FORMAT
from commerce_sessionization_spark.sources.io import (
    read_behaviors_csv,
    write_partitioned_parquet,
)


def with_partition_columns(df: DataFrame, shift_days: int = 0) -> DataFrame:
    """Derive string partition columns ``event_date``/``event_hour``.

    ``date_format(to_timestamp(event_time))`` per ``DailyFileDivider.scala:
    26-40``. ``shift_days`` reproduces the documented +1877-day date-shift
    variant (``README.md:19-30``) used to replay the 2019 Kaggle dump as if
    current; it also rewrites ``event_time`` itself so ids stay consistent.
    """
    ts = F.to_timestamp("event_time", EVENT_TIME_FORMAT)
    if shift_days:
        ts = F.timestamp_seconds(F.unix_timestamp(ts) + shift_days * 86400)
        df = df.withColumn(
            "event_time", F.concat(F.date_format(ts, "yyyy-MM-dd HH:mm:ss"), F.lit(" UTC"))
        )
    return df.withColumn("event_date", F.date_format(ts, "yyyy-MM-dd")).withColumn(
        "event_hour", F.date_format(ts, "HH")
    )


def divide_file(
    spark: SparkSession,
    csv_path: str,
    base_path: str,
    shift_days: int = 0,
) -> None:
    """EP2 — split a monthly CSV into ``{base}/logs`` hourly partitions."""
    df = read_behaviors_csv(spark, csv_path)
    df = with_partition_columns(df, shift_days=shift_days)
    write_partitioned_parquet(df, f"{base_path}/logs")
