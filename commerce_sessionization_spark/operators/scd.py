"""Slowly-changing-dimension (SCD Type 2) history building.

Turns an append-only stream of attribute snapshots into versioned
validity ranges — the warehouse-maintenance primitive behind "what did
this row look like on date X":

    (key, ts, attrs…)  →  (key, attrs…, effective_from, effective_to,
                           version, is_current)

Change detection collapses consecutive snapshots with identical tracked
attributes (no spurious versions); ``effective_to`` is the next change's
timestamp, NULL while current.

Scale shape: one shuffle on the key, two window passes sharing the same
(key, order) sort — Catalyst plans a single Exchange+Sort, same as the
sessionization chain. No driver state, no iteration.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    snapshots: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Build SCD2 validity ranges from an ordered snapshot stream.

    ``order_cols`` break timestamp ties so the version sequence is total
    (same discipline as every window in this engine). Rows where every
    tracked attribute equals the previous snapshot's are collapsed into
    the open version.
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        # null-safe inequality: a change to/from NULL is a change
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.lag(F.col(ts_col)).over(w).isNull()

    marked = snapshots.withColumn("_new_version", first | changed)
    versions = marked.filter(F.col("_new_version")).drop("_new_version")

    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        versions.withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead(F.col(ts_col)).over(w2))
        .withColumn("version", F.row_number().over(w2))
        .withColumn("is_current", F.col("effective_to").isNull())
        .drop(ts_col)
    )


def snapshot_asof(history: DataFrame, at, key_cols: Sequence[str]) -> DataFrame:
    """Point-in-time read of an SCD2 table: the version valid at ``at``
    (effective_from ≤ at < effective_to, open range while current)."""
    return history.filter(
        (F.col("effective_from") <= F.lit(at))
        & (F.col("effective_to").isNull() | (F.col("effective_to") > F.lit(at)))
    )
