"""Task-balance probe for the canonical-URL dedup shuffle key.

``dedup_by_canonical_url`` shuffles on the canonical URL. Real crawls
have HOT HOSTS (one domain holding 100× the median host's pages) but
near-unique URLs within them — so the hypothesis the plan relies on is
that host skew does NOT translate into shuffle-key skew, because the
key is the full URL, not the host. This probe proves it with ground
truth instead of argument: generate a corpus where one host owns ~99%
of all pages (every URL still unique, a small % of true duplicates
sprinkled in so the window has work), run the dedup, and replay the
Spark event log for per-task durations. The receipt is the
max-task/median-task ratio on the dedup stages: ~1 means the hot host
spread evenly across partitions; a sessionize-style hot key would show
up as one task holding 99% of the work.

Prints ONE JSON line. Usage:
    python tools/url_skew_probe.py [n_rows] [host_skew] [cores]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.urls import (
    dedup_by_canonical_url,
)
from commerce_sessionization_spark.session import get_spark


def _stage_tasks_for_group(
    log_dir: str, want_group: str
) -> dict[int, list[float]]:
    """Replay Spark event logs: stage id -> task durations (ms), for
    stages belonging to ``want_group``. Per-stage (not flat) because a
    job mixes the wide dedup stage with 1-task result aggregations —
    a flat max/median compares apples to the driver's oranges."""
    stage_group: dict[int, str] = {}
    out: dict[int, list[float]] = {}
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
                sid = ev.get("Stage ID")
                if (
                    stage_group.get(sid) == want_group
                    and info.get("Finish Time")
                    and info.get("Launch Time")
                ):
                    sr = (
                        (ev.get("Task Metrics") or {}).get(
                            "Shuffle Read Metrics"
                        )
                        or {}
                    )
                    read = (sr.get("Local Bytes Read") or 0) + (
                        sr.get("Remote Bytes Read") or 0
                    )
                    out.setdefault(sid, []).append(
                        (info["Finish Time"] - info["Launch Time"], read)
                    )
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    host_skew = float(sys.argv[2]) if len(sys.argv) > 2 else 0.99
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    log_dir = tempfile.mkdtemp(prefix="urlskew-eventlog-")
    spark = get_spark(
        app_name="url-skew-probe",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{log_dir}",
            # wide-cluster regime: no AQE partition coalescing, so task
            # balance is measured at the declared partition count, the
            # regime a 1000-executor job actually runs in
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    sc.setJobGroup("setup", "generate + cache")
    # hot host gets `host_skew` of all pages; URLs unique per row except
    # a planted 2% duplicate band (same path modulo 50) so the dedup
    # window has real collisions to resolve
    corpus = (
        spark.range(n)
        .select(
            F.col("id"),
            F.when(F.rand(7) < host_skew, F.lit("hot-host.example"))
            .otherwise(
                F.concat(
                    F.lit("host-"),
                    (F.rand(11) * 10_000).cast("long").cast("string"),
                    F.lit(".example"),
                )
            )
            .alias("host"),
        )
        .select(
            F.concat(
                F.lit("https://"),
                F.col("host"),
                F.lit("/page/"),
                F.when(
                    F.col("id") % 50 == 0, (F.col("id") / 100).cast("long")
                )
                .otherwise(F.col("id"))
                .cast("string"),
                F.lit("?utm_source=probe"),
            ).alias("url"),
            F.col("id").alias("fetched_at"),
        )
        .persist()
    )
    corpus.count()

    deduped = dedup_by_canonical_url(corpus, tie_col="fetched_at")

    sc.setJobGroup("warmup", "codegen/JIT")
    deduped.select(F.count("*")).collect()

    sc.setJobGroup("dedup", "dedup_by_canonical_url")
    t0 = time.time()
    n_out = deduped.select(F.count("*")).collect()[0][0]
    wall = time.time() - t0

    spark.stop()  # flushes the event log
    stages = _stage_tasks_for_group(log_dir, "dedup")
    # key skew shows up on the REDUCE side: the stage whose tasks read
    # the (canonical-url-partitioned) shuffle. Pick it by shuffle-read
    # bytes, and report both duration and bytes balance there.
    sid, recs = max(
        stages.items(), key=lambda kv: sum(r[1] for r in kv[1])
    )
    durs = sorted(r[0] for r in recs)
    reads = sorted(r[1] for r in recs)
    med, mx = durs[len(durs) // 2], durs[-1]
    med_b, mx_b = reads[len(reads) // 2], reads[-1]
    print(
        json.dumps(
            {
                "rows": n,
                "rows_out": n_out,
                "host_skew": host_skew,
                "cores": cores,
                "reduce_stage_tasks": len(durs),
                "median_task_ms": med,
                "max_task_ms": mx,
                "max_over_median": round(mx / med, 2) if med else None,
                "median_shuffle_read_b": med_b,
                "max_shuffle_read_b": mx_b,
                "max_over_median_bytes": (
                    round(mx_b / med_b, 2) if med_b else None
                ),
                "wall_sec": round(wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
