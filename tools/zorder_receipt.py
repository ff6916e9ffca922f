"""Z-order layout receipt: file/row-group skipping for 2-D predicates.

The claim behind ``operators.layout.write_zordered`` is that a layout
clustered by the interleaved z-key lets parquet footer min/max stats
prune most of the table for CONJUNCTIVE predicates on the clustered
columns — where a linear (primary-key-sorted) layout prunes nothing,
because each file spans the full range of both filter columns.

This probe makes that measurable at sf1 (6M-row lineitem):

1. writes the same rows twice — linear (range-sorted by ``l_orderkey``,
   the layout a naive pipeline produces) and z-ordered on
   ``(l_extendedprice, l_quantity)`` — with the SAME file count;
2. audits every row group's footer stats with pyarrow and counts how
   many row groups / bytes a 5%×5% conjunctive predicate must read —
   the exact pruning decision the parquet reader makes;
3. times the filtered aggregate in Spark on both layouts (median of 3).

The probe columns are chosen UNcorrelated with ``l_orderkey``: the
scaled dataset's per-copy key offsets make all *key* columns macro-
correlated with each other and with the natural write order, which
would let the linear layout prune by accident and understate the gap.
Price and quantity carry no copy structure.

Prints one JSON line for SCALE.md.

Usage: python tools/zorder_receipt.py [sf_dir] [work_dir]
       (defaults: /tmp/sf1 /tmp/zorder_probe)
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.layout import write_zordered
from commerce_sessionization_spark.session import get_spark
from commerce_sessionization_spark.sources.tables import load_table

COL_A, COL_B = "l_extendedprice", "l_quantity"

#: each column's predicate covers its [0.50, 0.55] quantile band — 5%
#: marginal selectivity by construction (values can be sparse in their
#: range, so fixed literals would lie); the conjunction reads ~0.25%
#: of rows when the columns are independent.
Q_LO, Q_HI = 0.50, 0.55
NUM_FILES = 64

A_LO = A_HI = B_LO = B_HI = None  # set in main() from quantiles


def _predicate():
    return F.col(COL_A).between(A_LO, A_HI) & F.col(COL_B).between(
        B_LO, B_HI
    )


def rowgroup_audit(path: str) -> dict:
    """Row groups / bytes the predicate must read, per footer stats."""
    total_rg = kept_rg = 0
    total_bytes = kept_bytes = 0
    for f in sorted(Path(path).glob("*.parquet")):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            size = rg.total_byte_size
            total_rg += 1
            total_bytes += size
            sa = rg.column(names[COL_A]).statistics
            sb = rg.column(names[COL_B]).statistics
            overlaps = (
                sa is None
                or sb is None
                or (sa.min <= A_HI and sa.max >= A_LO)
                and (sb.min <= B_HI and sb.max >= B_LO)
            )
            if overlaps:
                kept_rg += 1
                kept_bytes += size
    return {
        "row_groups": total_rg,
        "row_groups_read": kept_rg,
        "bytes": total_bytes,
        "bytes_read": kept_bytes,
    }


def timed_scan(spark, path: str) -> float:
    runs = []
    for i in range(4):  # first run discarded: codegen compile
        t0 = time.perf_counter()
        (
            spark.read.parquet(path)
            .filter(_predicate())
            .agg(F.sum(COL_A), F.count(F.lit(1)))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        if i:
            runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/zorder_probe")
    shutil.rmtree(work, ignore_errors=True)

    spark = get_spark(app_name="zorder-receipt")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, sf_dir, "lineitem")

    global A_LO, A_HI, B_LO, B_HI
    (A_LO, A_HI), (B_LO, B_HI) = (
        li.stat.approxQuantile(COL_A, [Q_LO, Q_HI], 0.001),
        li.stat.approxQuantile(COL_B, [Q_LO, Q_HI], 0.001),
    )

    linear = str(work / "linear")
    zord = str(work / "zorder")
    (
        li.repartitionByRange(NUM_FILES, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(linear)
    )
    write_zordered(li, zord, [COL_A, COL_B], bits=8, num_files=NUM_FILES)

    # correctness first: both layouts must hold identical row multisets
    # (checked on the filtered slice both engines will actually read)
    agg = lambda p: (  # noqa: E731
        spark.read.parquet(p)
        .filter(_predicate())
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(COL_A).cast("decimal(20,2)")).alias("s"),
        )
        .collect()[0]
    )
    a, b = agg(linear), agg(zord)
    assert (a["n"], a["s"]) == (b["n"], b["s"]), (a, b)
    assert a["n"] > 0, "probe predicate selected nothing — bounds bug"

    out = {
        "probe": "zorder_2d_predicate",
        "sf_dir": sf_dir,
        "predicate": {COL_A: [A_LO, A_HI], COL_B: [B_LO, B_HI]},
        "rows_selected": a["n"],
        "linear": dict(rowgroup_audit(linear), scan_sec=timed_scan(spark, linear)),
        "zorder": dict(rowgroup_audit(zord), scan_sec=timed_scan(spark, zord)),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
