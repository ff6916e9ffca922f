"""Scaling evidence: run linear-output catalog queries at 1× and 3× data
and report rows/sec — near-constant throughput is the 'would this survive
a scale-up' datapoint the plan audits argue for.

Builds a 3× dataset by unioning three key-offset copies of sf0.1 (users,
events, and documents get disjoint id ranges per copy, so per-key work —
sessions per user, grams per doc — stays constant while volume triples).
Queries chosen for linear output: sessionize_events (window chain),
pricing_summary (scan+agg), doc_stats / repetition_scores (text).

    python tools/scaling_probe.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from commerce_sessionization_spark.plans.queries import all_spark_queries
from commerce_sessionization_spark.session import get_spark
from commerce_sessionization_spark.sources.tables import load_table

BASE = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/sf_scaled3"
COPIES = 3
QUERIES = ("sessionize_events", "pricing_summary", "doc_stats",
           "repetition_scores", "time_weighted_value")


def build_scaled(spark) -> None:
    specs = {
        "events": {"event_id": 10**9, "user_id": 10**6},
        "documents": {"doc_id": 10**7},
        "lineitem": {"l_orderkey": 10**8},
    }
    os.makedirs(OUT, exist_ok=True)
    for table, offsets in specs.items():
        src = load_table(spark, BASE, table)
        parts = []
        for c in range(COPIES):
            d = src
            for col, step in offsets.items():
                d = d.withColumn(col, F.col(col) + F.lit(c * step))
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{OUT}/{table}.parquet")


def time_query(q, spark, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    spark = get_spark(
        app_name="scaling_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)
    qs = all_spark_queries()
    print(f"{'query':24s} {'1x':>8s} {'3x':>8s} {'ratio':>7s}  (ratio ≈ 3 = linear)")
    worst = 0.0
    for name in QUERIES:
        t1 = time_query(qs[name], spark, BASE)
        t3 = time_query(qs[name], spark, OUT)
        ratio = t3 / t1
        worst = max(worst, ratio)
        print(f"{name:24s} {t1:7.2f}s {t3:7.2f}s {ratio:6.2f}x")
    print(f"worst ratio {worst:.2f}x for 3x data "
          f"({'sub-linear/linear - PASS' if worst < 4.5 else 'SUPER-LINEAR - investigate'})")
    spark.stop()
    return 0 if worst < 4.5 else 1


if __name__ == "__main__":
    raise SystemExit(main())
