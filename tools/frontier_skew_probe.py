"""Task-balance probe for the crawl frontier's per-host politeness cap.

``crawl_frontier`` ranks candidates per host with a plain
``row_number() <= k`` window — and real webs have a link-farm host
owning most of the candidate set. The plan is nevertheless skew-safe on
Spark ≥ 3.5 because the optimizer inserts a PARTIAL ``WindowGroupLimit``
before the host exchange: every map task pre-prunes its slice to k rows
per host, so the shuffle moves at most map_tasks × k rows per host.

This probe proves that with event-log ground truth instead of argument:
ONE host owns ~99% of 2M candidate URLs; the group's heaviest-task
stage is measured twice — with the optimization (default) and with the
``InferWindowGroupLimit`` rule excluded (the pre-3.5 plan every naive
implementation ships). The receipt is the max-task/median-task
shuffle-read ratio: ~1 with the rule, ~cores× without (one task reading
the whole hot host).

Prints ONE JSON line. Usage:
    python tools/frontier_skew_probe.py [n_rows] [host_skew] [cores]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.crawl import crawl_frontier
from commerce_sessionization_spark.session import get_spark
from tools.url_skew_probe import _stage_tasks_for_group

PER_HOST_K = 100
_WGL_RULE = "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    host_skew = float(sys.argv[2]) if len(sys.argv) > 2 else 0.99
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    log_dir = tempfile.mkdtemp(prefix="frontierskew-eventlog-")
    spark = get_spark(
        app_name="frontier-skew-probe",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{log_dir}",
            # wide-cluster regime: no AQE coalescing/skew rescue — task
            # balance is measured at the declared partition count
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.adaptive.skewJoin.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    sc.setJobGroup("setup", "generate + cache")
    links = (
        spark.range(n)
        .select(
            F.concat(
                F.lit("https://ref-"),
                (F.col("id") % 1000).cast("string"),
                F.lit(".example/idx"),
            ).alias("src"),
            F.concat(
                F.lit("https://"),
                F.when(F.rand(7) < host_skew, F.lit("link-farm.example"))
                .otherwise(
                    F.concat(
                        F.lit("host-"),
                        (F.rand(11) * 10_000).cast("long").cast("string"),
                        F.lit(".example"),
                    )
                ),
                F.lit("/p/"),
                F.col("id").cast("string"),
            ).alias("dst"),
        )
        .persist()
    )
    links.count()
    fetched = spark.createDataFrame(
        [("https://nothing-fetched.example/",)], "url string"
    )

    def run(group: str) -> tuple[float, int]:
        sc.setJobGroup("warmup-" + group, "codegen/JIT")
        crawl_frontier(links, fetched, PER_HOST_K).select(
            F.count("*")
        ).collect()
        sc.setJobGroup(group, group)
        t0 = time.time()
        n_out = (
            crawl_frontier(links, fetched, PER_HOST_K)
            .select(F.count("*"))
            .collect()[0][0]
        )
        return time.time() - t0, n_out

    limited_wall, n_limited = run("with-window-group-limit")
    spark.conf.set("spark.sql.optimizer.excludedRules", _WGL_RULE)
    naive_wall, n_naive = run("rule-excluded")
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    assert n_limited == n_naive, (n_limited, n_naive)

    spark.stop()  # flushes the event log

    def balance(group: str) -> dict:
        stages = _stage_tasks_for_group(log_dir, group)
        # the stage holding the group's single heaviest task — exactly
        # where a hot-key pathology lives if there is one
        sid, recs = max(
            stages.items(), key=lambda kv: max(r[1] for r in kv[1])
        )
        durs = sorted(r[0] for r in recs)
        reads = sorted(r[1] for r in recs)
        return {
            "stage": sid,
            "tasks": len(recs),
            "task_ms_max_over_median": round(
                durs[-1] / max(durs[len(durs) // 2], 1), 2
            ),
            "shuffle_read_max_over_median": round(
                reads[-1] / max(reads[len(reads) // 2], 1), 2
            ),
        }

    out = {
        "probe": "frontier_host_skew",
        "n_rows": n,
        "host_skew": host_skew,
        "cores": cores,
        "rows_out": n_limited,
        "window_group_limit": dict(
            balance("with-window-group-limit"),
            wall_sec=round(limited_wall, 2),
        ),
        "rule_excluded": dict(
            balance("rule-excluded"), wall_sec=round(naive_wall, 2)
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
