"""Measure the skew mitigation: plain vs bucketed sessionization on a
hot-key dataset.

``sessionize`` windows by user — at 100 TB one bot/load-test user becomes
one task sorting its whole history (AQE cannot split a window partition;
``OptimizeSkewedJoin`` applies to joins only). ``sessionize_bucketed``
windows by (user, time-bucket) and stitches boundaries, so the hot user's
sort fans out across buckets.

This script plants a 90%-skew user, times both strategies on the same
cached input (forced via a noop-style full materialization), verifies the
outputs are identical, and prints one JSON line. Numbers are recorded in
SCALE.md.

Usage: python tools/skew_demo.py [n_rows] [skew_fraction]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.sessions import (
    sessionize,
    sessionize_bucketed,
)
from commerce_sessionization_spark.session import get_spark

BASE_US = 1_700_000_000_000_000  # 2023-11-14, arbitrary fixed epoch
SPAN_DAYS = 30


def make_events(spark, n: int, skew: float):
    """n events over 30 days; `skew` of them belong to user 0."""
    span_us = SPAN_DAYS * 86_400 * 1_000_000
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.rand(7) < skew, F.lit(0))
            .otherwise((F.rand(11) * 100_000).cast("long") + 1)
            .alias("user_id"),
            F.timestamp_micros(
                (F.lit(BASE_US) + (F.rand(13) * span_us).cast("long"))
            ).alias("ts"),
        )
        .persist()
    )


def materialize(df) -> float:
    """Force every row's session id; return wall seconds."""
    t0 = time.time()
    df.select(F.sum(F.crc32(F.col("session_id")))).collect()
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    skew = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    spark = get_spark(app_name="skew-demo")
    events = make_events(spark, n, skew)
    events.count()  # pay generation + cache once, outside both timings

    plain = sessionize(events, order_cols=("event_id",))
    bucketed = sessionize_bucketed(
        events, bucket_hours=12, order_cols=("event_id",)
    )

    # warm both plans once (codegen/JIT), then time
    materialize(plain)
    materialize(bucketed)
    t_plain = materialize(plain)
    t_bucketed = materialize(bucketed)

    mismatch = (
        plain.alias("p")
        .join(bucketed.alias("b"), "event_id")
        .where(F.col("p.session_id") != F.col("b.session_id"))
        .count()
    )

    # the mechanism: max rows any one window-sort task must handle
    max_user = events.groupBy("user_id").count().agg(F.max("count")).first()[0]
    bucket_us = 12 * 3600 * 1_000_000
    max_user_bucket = (
        events.groupBy(
            "user_id", F.floor(F.unix_micros("ts") / F.lit(bucket_us))
        )
        .count()
        .agg(F.max("count"))
        .first()[0]
    )

    print(
        json.dumps(
            {
                "rows": n,
                "skew": skew,
                "plain_sec": round(t_plain, 2),
                "bucketed_sec": round(t_bucketed, 2),
                "speedup": round(t_plain / t_bucketed, 2),
                "max_window_rows_plain": max_user,
                "max_window_rows_bucketed": max_user_bucket,
                "outputs_identical": mismatch == 0,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
