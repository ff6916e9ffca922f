"""Streaming pipeline sink: sessionized stream → hive-partitioned parquet.

The stream analogue of the hourly batch pipeline (EP1's output contract):
per-event session ids land in ``{out}/sessions/event_date=/event_hour=``,
the same layout batch consumers and the reference's validation DAG read
(``sessionization_batch_test.py:43,53``). ``foreachBatch`` gives the
partitioned-parquet write (streaming file sinks can't dynamic-partition-
overwrite); each micro-batch appends only its own rows, and exactly-once
comes from the checkpoint + idempotent-per-epoch write.

At scale: the state store carries the per-user session state (see
``sessionize_stream.py``); the sink's partition clustering per micro-batch
keeps file counts at (#hours touched per batch) × (#clustered tasks).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commerce_sessionization_spark.streaming.sessionize_stream import (
    read_events_stream,
    sessionize_stream_stateful,
)


def with_hour_partitions(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive the hive partition columns from the event timestamp."""
    return df.withColumn(
        "event_date", F.date_format(ts_col, "yyyy-MM-dd")
    ).withColumn("event_hour", F.date_format(ts_col, "HH"))


def stream_sessions_to_parquet(
    spark,
    source_glob: str,
    out_path: str,
    checkpoint: str,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
    available_now: bool = True,
    **source_options: Any,
):
    """Wire source → stateful sessionize → partitioned parquet.

    Returns the started StreamingQuery; with ``available_now`` the query
    drains the backlog and stops (batch-like invocation of the stream
    pipeline — handy for backfills with streaming semantics).
    """
    events = read_events_stream(spark, source_glob, **source_options)
    sessions = sessionize_stream_stateful(
        events, gap_seconds=gap_seconds, watermark=watermark
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            with_hour_partitions(batch_df)
            .repartition("event_date", "event_hour")
            .write.partitionBy("event_date", "event_hour")
            .mode("append")
            .parquet(f"{out_path}/sessions")
        )

    writer = sessions.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
