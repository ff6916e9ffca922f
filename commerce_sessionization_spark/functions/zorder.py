"""Z-order (Morton) interleaving for multi-column data layout.

The lakehouse clustering primitive (Delta OPTIMIZE ZORDER BY, Iceberg
sort orders): rank each clustering column into a fixed-width integer,
interleave the bits, and lay files out along the resulting curve. Files
then cover small hyper-rectangles of the key space instead of slabs of
one column, so parquet min/max row-group pruning works for predicates
on ANY clustered column, not just the leading sort key.

Everything here is closed-form integer arithmetic (scale → shift →
or), so z-values are exactly replayable by any engine — the catalog
query's DuckDB oracle recomputes them bit-for-bit. The scaling pass
needs each column's (min, max), a 1-row broadcast.

Spark-first shape: the z-value is one codegen'd column expression (no
UDF); the layout write is ``repartitionByRange(z)`` +
``sortWithinPartitions(z)`` — the standard range-shuffle that Spark
already load-balances by sampling, then a local sort that parquet
turns into tight per-row-group min/max spans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default per-column resolution: 16 bits keeps d<=4 columns inside the
#: sign-safe 63-bit budget of a BIGINT z-value
DEFAULT_BITS = 16


def scale_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Linear-scale a numeric column into [0, 2^bits):
    floor((v-min)/(max-min) · (2^bits − 1)), with the ratio computed in
    DOUBLE — one correctly-rounded IEEE divide and multiply, so every
    engine produces the identical bucket (the all-integer formulation
    overflows int64/2^53 for wide spans like microsecond timestamps).
    The ratio is ≤ 1 even when rounding up, so the bucket never exceeds
    2^bits − 1. A constant column (max == min) collapses to bucket 0."""
    top = float((1 << bits) - 1)
    span = (cmax.cast("long") - cmin.cast("long")).cast("double")
    v = (col.cast("long") - cmin.cast("long")).cast("double")
    return F.when(span <= 0, F.lit(0).cast("long")).otherwise(
        F.floor(v / span * F.lit(top)).cast("long")
    )


def interleave_bits(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave ``d`` pre-scaled [0, 2^bits) longs: bit ``b``
    of column ``i`` lands at position ``b*d + i``. d*bits must stay
    below 63. Pure shifts/ors — one whole-stage-codegen expression."""
    d = len(cols)
    if d * bits > 62:
        raise ValueError(f"{d} cols x {bits} bits exceeds the BIGINT budget")
    terms = [
        F.shiftleft(
            F.shiftright(cols[i], b).bitwiseAND(F.lit(1)), b * d + i
        )
        for i in range(d)
        for b in range(bits)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    out_col: str = "zval",
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Append the Morton z-value of ``cols`` (numeric/date/timestamp,
    scaled by the table's own min/max — one tiny aggregate, broadcast
    back via crossJoin)."""
    num = {c: F.col(c).cast("long") for c in cols}
    stats = df.agg(
        *[F.min(num[c]).alias(f"_mn_{c}") for c in cols],
        *[F.max(num[c]).alias(f"_mx_{c}") for c in cols],
    )
    scaled = [
        scale_to_bits(
            num[c], F.col(f"_mn_{c}"), F.col(f"_mx_{c}"), bits
        )
        for c in cols
    ]
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, interleave_bits(scaled, bits))
        .drop(*[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """OPTIMIZE ZORDER BY, expressed in stock Spark: z-value →
    range-shuffle on it (Spark samples the distribution, so files get
    balanced row counts even on skewed keys) → local sort → parquet.
    The z column itself is dropped before the write; its effect lives
    in the file/row-group min-max spans."""
    (
        with_zvalue(df, cols, "_z", bits)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
