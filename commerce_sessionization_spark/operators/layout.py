"""Z-order data layout: multi-dimensional clustering for file skipping.

A hive partition key prunes one dimension; queries that filter two or
more columns (user AND time, price AND date) still scan every file in
the matching partition. Z-ordering interleaves the bits of several
columns' bucket ranks into one clustering key, then range-partitions and
sorts the write by that key — each output file covers a small HYPERCUBE
of the filtered space, so parquet footer min/max statistics prune files
for predicates on ANY prefix-free combination of the clustered columns.

All arithmetic is built-in integer expressions (shiftleft / bitwise OR),
JVM-side and codegen-friendly. The only extra pass is one scalar
min/max aggregate per clustered column, broadcast back as literals-via-
join — at 100 TB that's a single column-pruned scan, and in practice
the bounds come from table metadata for free.

The write path is ``repartitionByRange`` on the z-key (range exchange =
one shuffle — the same shuffle ANY clustered write pays) followed by a
within-partition sort, so file boundaries are contiguous z-ranges.
Skew: range partitioning samples the key distribution, so hot z-cells
split across files rather than hot-spotting one reducer.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Rank ``col`` into ``2**bits`` equal-width buckets of [cmin, cmax]."""
    n = 1 << bits
    span = (cmax.cast("double") - cmin.cast("double"))
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span
                  ).otherwise(F.lit(0.0))
    return F.least(F.floor(frac * n).cast("long"), F.lit(n - 1))


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> DataFrame:
    """Append ``_zkey``: bit-interleaved bucket ranks of ``cols``.

    ``bits`` per dimension; the key has ``bits * len(cols)`` significant
    bits (≤ 63 total). Numeric and timestamp columns both work — the
    bucket rank is computed on the double cast.
    """
    names = list(cols)
    if bits * len(names) > 63:
        raise ValueError("bits * len(cols) must fit a signed long")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_min_{c}") for c in names],
        *[F.max(F.col(c).cast("double")).alias(f"_max_{c}") for c in names],
    )
    with_bounds = df.join(F.broadcast(bounds))
    buckets = [
        _bucket(
            F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits
        ).alias(f"_b_{c}")
        for c in names
    ]
    staged = with_bounds.select(*df.columns, *buckets)
    # interleave: output bit (b * ndims + i) takes bit b of dimension i
    terms = [
        F.shiftleft(
            F.shiftright(F.col(f"_b_{c}"), b).bitwiseAND(F.lit(1)),
            b * len(names) + i,
        )
        for b in range(bits)
        for i, c in enumerate(names)
    ]
    zkey = reduce(lambda a, t: a.bitwiseOR(t), terms[1:], terms[0])
    return staged.select(*df.columns, zkey.alias("_zkey"))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``cols``.

    Files are contiguous z-ranges: predicates on any subset of ``cols``
    skip files via footer min/max stats without reading data pages.
    """
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global dense 1..N ordinals under a TOTAL order — without the
    single-partition window.

    ``row_number().over(Window.orderBy(...))`` funnels the whole table
    through one task (Spark even warns); the scalable formulation is
    two-phase: range-partition on the order keys, rank WITHIN each
    partition (local sort only), then shift each partition by the row
    count of all partitions before it. The per-partition counts are
    the only driver state (num_partitions integers — the kmeans-model
    pattern), and the offset table broadcasts back. The assigned ranks
    are a pure function of the total order, so they are identical for
    ANY partition boundaries the range sampler picks — which is what
    lets a SQL oracle replay them with a plain row_number.

    ``order_cols`` must be a total order (add a unique tiebreak);
    ranks of tied rows would otherwise depend on partitioning.
    """
    from pyspark.sql import Window

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    # localCheckpoint pins the partitioning: the counts collect and the
    # ranked output must see the SAME partition assignment
    with_pid = with_pid.localCheckpoint()
    counts = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets, "_pid int, _offset long")
    )
    w_local = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        with_pid.join(off_df, "_pid")
        .withColumn(rank_col, F.row_number().over(w_local) + F.col("_offset"))
        .drop("_pid", "_offset")
    )
