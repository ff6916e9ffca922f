"""Runtime profile of a catalog query: per-stage shuffle and I/O metrics.

The static plan audit (gen_plan_report.py) counts exchanges; this tool
measures what they actually MOVE — per-stage shuffle read/write bytes,
input bytes/records, and task time — from Spark's status REST API after
executing the query with the noop sink. The number that matters at
100 TB is shuffle bytes per input byte: a query that reads 1 GB and
shuffles 5 GB has a plan problem no unit test sees.

    python tools/profile_query.py minhash_lsh_pairs [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

os.environ["SPARK_UI"] = "true"  # must be set before the JVM starts

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from commerce_sessionization_spark.plans.queries import all_spark_queries  # noqa: E402
from commerce_sessionization_spark.session import get_spark  # noqa: E402


def human(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024:
            return f"{n:,.1f} {unit}"
        n /= 1024
    return f"{n:,.1f} TiB"


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"profile-{name}", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_spark_queries()
    if name not in queries:
        print(f"unknown query {name!r}")
        return 2
    t0 = time.time()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    done = [s for s in stages if s["status"] == "COMPLETE"]
    done.sort(key=lambda s: s["stageId"])
    tot = {"in_b": 0, "in_r": 0, "sr_b": 0, "sw_b": 0, "task_ms": 0}
    print(f"\n{name} @ {sf_dir} — wall {wall:.2f}s, {len(done)} stages")
    print(f"{'stage':>5} {'tasks':>5} {'input':>12} {'shuf read':>12} "
          f"{'shuf write':>12} {'task time':>10}")
    for s in done:
        tot["in_b"] += s["inputBytes"]; tot["in_r"] += s["inputRecords"]
        tot["sr_b"] += s["shuffleReadBytes"]; tot["sw_b"] += s["shuffleWriteBytes"]
        tot["task_ms"] += s["executorRunTime"]
        print(f"{s['stageId']:>5} {s['numCompleteTasks']:>5} "
              f"{human(s['inputBytes']):>12} {human(s['shuffleReadBytes']):>12} "
              f"{human(s['shuffleWriteBytes']):>12} {s['executorRunTime']/1000:>9.1f}s")
    print(f"{'TOTAL':>5} {'':>5} {human(tot['in_b']):>12} "
          f"{human(tot['sr_b']):>12} {human(tot['sw_b']):>12} "
          f"{tot['task_ms']/1000:>9.1f}s")
    # NOTE: parquet "input bytes" is the post-pruning columnar read, so
    # per-RECORD shuffle volume is the stable diagnostic
    per_rec = tot["sw_b"] / tot["in_r"] if tot["in_r"] else float("nan")
    print(f"\nshuffle-write per input record: {per_rec:,.1f} B "
          f"(input records: {tot['in_r']:,}; "
          f"columnar input read: {human(tot['in_b'])})")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
