"""Build an sf1-equivalent dataset as N key-offset copies of sf0.1.

The testdata ships sf0.001/0.01/0.1 only; the round-2 verdict asked for
a decade-scale bench point (sf0.1 → sf1) to catch super-linear queries
before a cluster does. Scaling rules:

- **Fact tables** get disjoint key ranges per copy (events/user ids,
  doc ids, the whole TPC-H FK web offset in sync) so referential
  integrity holds and per-key work — sessions per user, lines per
  order — stays constant while volume grows N×.
- **Document text is word-tagged per copy** (every word prefixed with
  the copy tag for copies ≥ 1): a verbatim text copy would make every
  doc a cross-copy near-duplicate, inflating the dedup/LSH queries'
  candidate pairs quadratically in N and poisoning the scaling signal.
  Tagging zeroes cross-copy shingle overlap while keeping per-doc
  length/token statistics (and therefore per-doc work) constant — and
  vocabulary growing with corpus size is what a real 10× corpus does.
- **Dimension tables** ``nation``/``region`` are fixed, as in TPC-H.

Usage: python tools/make_scaled_sf.py [copies] [out_dir]
       (defaults: 10 /tmp/sf1)
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from commerce_sessionization_spark.session import get_spark
from commerce_sessionization_spark.sources.tables import load_table

BASE = os.environ.get("SF_DIR", "/root/testdata/sf0.1")

#: per-copy key offsets; every FK pair shares its step so joins stay valid
OFFSETS: dict[str, dict[str, int]] = {
    "events": {"event_id": 10**9, "user_id": 10**7},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
    "customer": {"c_custkey": 10**7},
    "orders": {"o_orderkey": 10**8, "o_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**8, "l_partkey": 10**6, "l_suppkey": 10**5},
    "part": {"p_partkey": 10**6},
    "supplier": {"s_suppkey": 10**5},
}
FIXED_DIMS = ("nation", "region")


def build(spark, copies: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for table, offsets in OFFSETS.items():
        src = load_table(spark, BASE, table)
        parts = []
        for c in range(copies):
            d = src
            for col, step in offsets.items():
                d = d.withColumn(col, F.col(col) + F.lit(c * step))
            if table == "documents" and c > 0:
                # tag every word: kills cross-copy shingle overlap without
                # changing per-doc token counts/lengths materially
                d = d.withColumn(
                    "text",
                    F.regexp_replace(F.col("text"), r"(\w+)", f"x{c}$1"),
                )
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
    for dim in FIXED_DIMS:
        dst = f"{out}/{dim}.parquet"
        shutil.rmtree(dst, ignore_errors=True)
        load_table(spark, BASE, dim).write.mode("overwrite").parquet(dst)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    spark = get_spark(app_name="make-scaled-sf")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, copies, out)
    for t in list(OFFSETS) + list(FIXED_DIMS):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n}")
    spark.stop()


if __name__ == "__main__":
    main()
