"""Local replica of the driver's correctness gate.

Runs each catalog query through Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column-name sets, and the
order-insensitive multiset of values. Use while iterating:

    python tools/check_oracle.py                  # all queries @ sf0.01
    python tools/check_oracle.py knn_cosine ...   # subset
    SF_DIR=/root/testdata/sf0.001 python tools/check_oracle.py
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from commerce_sessionization_spark.plans.queries import FULL_CATALOG
from commerce_sessionization_spark.schemas import ALL_TESTDATA_TABLES
from commerce_sessionization_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: repr of the double
        return repr(v)
    return str(v)


def row_key(row, cols):
    return tuple(norm(row[c]) for c in cols)


def main(names: list[str]) -> int:
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in ALL_TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    failures = 0
    for q in FULL_CATALOG:
        if names and q.name not in names:
            continue
        t0 = time.time()
        try:
            sdf = q.spark(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {q.name}: spark error: {e}")
            failures += 1
            continue
        if q.oracle is None:
            print(f"ok   {q.name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(q.oracle)
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {q.name}: duckdb error: {e}")
            failures += 1
            continue
        dcols = sorted(duck_cols)
        if scols != dcols:
            print(f"FAIL {q.name}: columns differ spark={scols} duck={dcols}")
            failures += 1
            continue
        if len(srows) != len(duck_rows):
            print(f"FAIL {q.name}: rowcount spark={len(srows)} duck={len(duck_rows)}")
            failures += 1
            continue
        smult = sorted(row_key(r, scols) for r in srows)
        order = [duck_cols.index(c) for c in dcols]
        dmult = sorted(tuple(norm(r[i]) for i in order) for r in duck_rows)
        if smult != dmult:
            diff_s = [r for r in smult if r not in set(dmult)][:3]
            diff_d = [r for r in dmult if r not in set(smult)][:3]
            print(f"FAIL {q.name}: values differ; spark-only={diff_s} duck-only={diff_d}")
            failures += 1
            continue
        print(f"ok   {q.name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
