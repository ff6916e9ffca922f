"""Multi-column blocking receipt for entity resolution (round-9).

``blocked_match_pairs`` accepts a LIST of blocking keys, but the graded
catalog query blocks on a single near-unique key. This probe prices the
other regime — a COARSE hot key (mktsegment: 5 values, so block size
grows linearly with the corpus) — and shows what compounding a second,
content-derived key (acctbal band) does to the pre-verify candidate
count, at sf0.1 and sf1 (the decade pair).

The number measured is the deduped candidate-pair count
(``return_candidates=True``): the verify stage is a per-candidate
constant, so candidates ARE the cost model for a blocking-key choice.
PassJoin segment keys already bound the within-block fan-out by
content; the second blocking column multiplies block cardinality
(5 segments × ~N balance bands), cutting every segment-key bucket by
the band selectivity — the standard compound-blocking move when no
single key is selective enough.

    python tools/er_blocking_probe.py [sf_dir ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from commerce_sessionization_spark.operators.entity import (  # noqa: E402
    blocked_match_pairs,
)
from commerce_sessionization_spark.session import get_spark  # noqa: E402
from commerce_sessionization_spark.sources.tables import load_table  # noqa: E402


def _pair_bound(spark, cust, keys) -> int:
    """Analytic candidate LOWER bound for a blocking-key choice: TPC-H
    customer names share the constant 'Customer#' prefix, so the first
    PassJoin segment of the 18-char padded prefix is identical for
    every record — candidates >= Σ_blocks C(|block|, 2). One cheap
    groupBy prices a key choice WITHOUT running the join (how a user
    should pre-flight a blocking key on 100 TB)."""
    from pyspark.sql import functions as F

    row = (
        cust.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) / 2")).alias("pairs"))
        .collect()[0]
    )
    return int(row["pairs"])


def probe(spark, sf_dir: str, measure_single: bool) -> None:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("bal_band"),
    )
    n = cust.count()
    out = [f"{sf_dir}: {n:,} customers"]
    for label, keys, run in (
        ("single-key (segment)", ["segment"], measure_single),
        ("two-key (segment, bal_band)", ["segment", "bal_band"], True),
    ):
        bound = _pair_bound(spark, cust, keys)
        line = (f"  {label:30s} bound>={bound:>14,}"
                f"  bound/record={bound / max(n, 1):>10,.1f}")
        if run:
            t0 = time.time()
            cands = blocked_match_pairs(
                cust, "cust_id", "name", keys,
                max_dist=2, prefix_len=18, return_candidates=True,
            ).count()
            line += f"  measured={cands:>14,}  wall={time.time() - t0:6.1f}s"
        else:
            line += "  (join not run: the bound IS the receipt)"
        out.append(line)
    print("\n".join(out))


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
    spark = get_spark(app_name="er-blocking-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        # the single-key join is only MEASURED at sf0.1 (~23M
        # candidates); at sf1 the analytic bound (~2.2B) is the receipt
        # — materializing a quadratic blowup to count it teaches nothing
        probe(spark, d, measure_single="sf1" not in d)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
