"""Max-TASK-duration probe: plain vs bucketed sessionization under a
planted hot user, measured from the Spark event log (ground truth).

Motivation (SCALE.md): with one user holding 90% of events, plain
``sessionize`` windows by user, so one task sorts ~90% of the input —
at scale that task IS the job's critical path. ``sessionize_bucketed``
windows by (user, 12h bucket), bounding every task's sort. TOTAL wall
time on a small box can still favor plain (three idle cores absorb the
hot task while bucketed pays extra stitching shuffles) — the quantity
the mitigation actually bounds is the LONGEST TASK, which is what
dominates wall time once the cluster is wide. So that is what this
probe measures: it tags each strategy's jobs with a job group, replays
the event log, and reports the max task duration per group.

Prints ONE JSON line; tests/test_sessions_bucketed.py asserts on it.

Usage: python tools/skew_task_probe.py [n_rows] [skew] [cores]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.sessions import (
    sessionize,
    sessionize_bucketed,
)
from commerce_sessionization_spark.session import get_spark

BASE_US = 1_700_000_000_000_000
SPAN_DAYS = 30


def _materialize(df) -> None:
    df.select(F.sum(F.crc32(F.col("session_id")))).collect()


def _max_task_ms_per_group(log_dir: str) -> dict[str, float]:
    """Replay Spark event logs: job group -> max task duration (ms)."""
    stage_group: dict[int, str] = {}
    out: dict[str, float] = {}
    # Spark 4 writes rolling event logs as a directory per app
    for log in sorted(p for p in Path(log_dir).rglob("*") if p.is_file()):
        for line in log.open(errors="replace"):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                group = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                if group:
                    for sid in ev.get("Stage IDs", []):
                        stage_group[sid] = group
            elif kind == "SparkListenerTaskEnd":
                info = ev.get("Task Info") or {}
                group = stage_group.get(ev.get("Stage ID"))
                if group and info.get("Finish Time") and info.get("Launch Time"):
                    dur = info["Finish Time"] - info["Launch Time"]
                    out[group] = max(out.get(group, 0.0), dur)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    skew = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    log_dir = tempfile.mkdtemp(prefix="skew-eventlog-")
    spark = get_spark(
        app_name="skew-task-probe",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{log_dir}",
            # simulate the wide-cluster regime: at 100 TB every shuffle
            # partition is full, so AQE never coalesces. At probe scale
            # (1M rows) coalescing would fold the whole bucketed stage
            # into 2 fat-but-balanced tasks and mask the skew signal this
            # probe exists to isolate. Skew-join splitting stays on.
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    span_us = SPAN_DAYS * 86_400 * 1_000_000
    sc.setJobGroup("setup", "generate + cache")
    events = (
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
    events.count()

    plain = sessionize(events, order_cols=("event_id",))
    bucketed = sessionize_bucketed(events, bucket_hours=12, order_cols=("event_id",))

    sc.setJobGroup("warmup", "codegen/JIT")
    _materialize(plain)
    _materialize(bucketed)

    sc.setJobGroup("plain", "plain sessionize")
    t0 = time.time()
    _materialize(plain)
    wall_plain = time.time() - t0
    sc.setJobGroup("bucketed", "bucketed sessionize")
    t0 = time.time()
    _materialize(bucketed)
    wall_bucketed = time.time() - t0

    spark.stop()  # flushes the event log
    per_group = _max_task_ms_per_group(log_dir)
    print(json.dumps({
        "rows": n,
        "skew": skew,
        "cores": cores,
        "max_task_ms_plain": per_group.get("plain"),
        "max_task_ms_bucketed": per_group.get("bucketed"),
        "wall_sec_plain": round(wall_plain, 2),
        "wall_sec_bucketed": round(wall_bucketed, 2),
    }))


if __name__ == "__main__":
    main()
