"""Spark-side smoke of EVERY catalog query at a larger scale factor.

The bench times a stable headline set; this sweeps the whole catalog
(default sf0.1) so a scale trap in a non-benched query — an accidental
cross join, a per-row quadratic expression, a broadcast of something
unbounded — shows up as an outlier timing long before 100 TB does it
the hard way.

    python tools/smoke_all.py                 # all queries @ sf0.1
    SF_DIR=/root/testdata/sf0.01 python tools/smoke_all.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from commerce_sessionization_spark.plans.queries import FULL_CATALOG
from commerce_sessionization_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    spark = get_spark(
        app_name="smoke_all",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    failures = 0
    for q in FULL_CATALOG:
        t0 = time.time()
        try:
            q.spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[q.name] = round(time.time() - t0, 2)
        except Exception as e:  # keep sweeping; report at the end
            failures += 1
            print(f"FAIL {q.name}: {type(e).__name__}: {e}", flush=True)
    for name, sec in sorted(timings.items(), key=lambda x: -x[1]):
        print(f"{sec:8.2f}s  {name}", flush=True)
    total = round(sum(timings.values()), 1)
    print(f"TOTAL {total}s over {len(timings)} queries, {failures} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
