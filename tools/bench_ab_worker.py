"""One side of an A/B bench: time a query list from ONE repo tree.

Invoked as a fresh subprocess per phase by tools/bench_ab.py so the two
code versions never share a JVM or a Python import space (the package
name is identical in both trees — they cannot coexist in one process).

    python tools/bench_ab_worker.py --repo-dir <tree> \
        --queries q1,q2,... [--repeats 2] [--sf-dir ...] [--cpus 32]

Prints ONE JSON line: {"timings": {q: median_sec}, "load_avg": ...}.
Mirrors bench.py's discipline: noop sink (fully distributed, no
collect), one warmup query, first per-query run discarded (codegen
compile is a per-plan constant, not a per-data cost).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo-dir", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    args = ap.parse_args()

    sys.path.insert(0, args.repo_dir)
    from commerce_sessionization_spark.plans.queries import all_spark_queries
    from commerce_sessionization_spark.session import get_spark

    load_avg = round(os.getloadavg()[0], 2)
    spark = get_spark(app_name="bench_ab", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_spark_queries()
    names = [n for n in args.queries.split(",") if n]
    missing = [n for n in names if n not in queries]
    if missing:
        raise SystemExit(f"queries absent from {args.repo_dir}: {missing}")

    queries["event_type_stats"](spark, args.sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        runs = []
        for i in range(args.repeats + 1):
            t0 = time.perf_counter()
            queries[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            if i > 0:
                runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
    print(json.dumps({"timings": timings, "load_avg": load_avg}))
    spark.stop()


if __name__ == "__main__":
    main()
