"""Core-count scaling receipt (VERDICT r10 item 6).

Runs a query list at two core counts (8 and 32 by default) against a
given SF dir — each core count in its OWN subprocess so the JVM's
master/defaultParallelism are set at startup exactly like the driver's
low-core bench — and prints the per-query wall ratio table to commit
into SCALE.md. sf0.1's sub-second stages sit below the per-job overhead
floor (r10: 32c vs 8c totals differed by 3%), so run this against the
10× /tmp/sf1 built by tools/make_scaled_sf.py.

    python tools/core_scaling_probe.py [--sf /tmp/sf1] [--cores 8,32]
        [--repeats 3] [--queries a,b,...] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: top-10 headline queries by round-10 bench cost (the shuffle/iteration
#: heavy families the scaling question is about)
DEFAULT = [
    "wpagerank_copurchase",
    "ppr_copurchase_fast",
    "pagerank_copurchase_fast",
    "hits_copurchase_fast",
    "embedding_covariance",
    "stream_vector_stats",
    "orders_profile",
    "triangle_counts",
    "kcore_parts",
    "customer_entity_resolution",
]

WORKER = r"""
import json, os, sys, time, statistics
sys.path.insert(0, sys.argv[1])
from commerce_sessionization_spark.plans.queries import all_spark_queries
from commerce_sessionization_spark.session import get_spark

sf_dir, cores, repeats = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
names = json.loads(sys.argv[5])
spark = get_spark(app_name=f"corescale-{cores}", master=f"local[{cores}]")
spark.sparkContext.setLogLevel("ERROR")
queries = all_spark_queries()
queries["event_type_stats"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()
out = {}
for name in names:
    runs = []
    for i in range(repeats + 1):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        if i > 0:  # first run pays codegen; discard
            runs.append(time.perf_counter() - t0)
    out[name] = round(statistics.median(runs), 3)
    print(f"# {cores}c {name}: {out[name]}s", file=sys.stderr, flush=True)
print(json.dumps(out))
spark.stop()
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf1")
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--queries", default=",".join(DEFAULT))
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]
    results: dict[str, dict[str, float]] = {}
    loads = {}
    for cores in args.cores.split(","):
        loads[cores] = round(os.getloadavg()[0], 2)
        proc = subprocess.run(
            [sys.executable, "-c", WORKER, str(REPO), args.sf, cores,
             str(args.repeats), json.dumps(names)],
            capture_output=True,
            text=True,
            check=True,
        )
        results[cores] = json.loads(proc.stdout.strip().splitlines()[-1])
    lo, hi = args.cores.split(",")
    table = {
        q: {
            f"c{lo}": results[lo][q],
            f"c{hi}": results[hi][q],
            "ratio": round(results[lo][q] / max(results[hi][q], 1e-9), 2),
        }
        for q in names
    }
    payload = {
        "sf_dir": args.sf,
        "cores": [int(lo), int(hi)],
        "repeats": args.repeats,
        "load_at_start": loads,
        "per_query": table,
    }
    print(json.dumps(payload, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(payload, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
