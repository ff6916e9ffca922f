"""Vector math as pure Column expressions — JVM-side, codegen-friendly.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside whole-stage
codegen (no Python round-trip), which is the right default for the
brute-force similarity path. Accumulation is left-to-right in double, the
same order DuckDB's list functions use, so oracle comparisons agree to the
last bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
