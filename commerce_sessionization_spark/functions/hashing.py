"""Portable, deterministic hashing helpers.

MinHash/SimHash need integer hashes that are reproducible across engines
(Spark's ``xxhash64`` seed/implementation is Spark-specific; DuckDB's
``hash`` is DuckDB-specific). We derive integers from SHA-256 — available
and bit-identical everywhere — by taking a 60-bit prefix of the hex digest.
Slower than xxhash64 but still JVM-side codegen; for pure-Spark paths where
cross-engine parity doesn't matter, pass ``fast=True`` to use xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hex_to_long(hex_col: Column, n_chars: int = 15) -> Column:
    """First ``n_chars`` hex chars → non-negative bigint (< 16^15 = 2^60)."""
    return F.conv(F.substring(hex_col, 1, n_chars), 16, 10).cast("long")


def stable_long_hash(col: Column, fast: bool = False, n_chars: int = 15) -> Column:
    """Deterministic integer hash of a string column (4·n_chars bits).

    Callers that multiply the hash (MinHash permutations) should pick
    ``n_chars`` small enough that a·x + b stays within int64 under ANSI
    mode (e.g. 12 hex chars = 48 bits leaves 15 bits of headroom).
    """
    if fast:
        return F.xxhash64(col)
    return hex_to_long(F.sha2(col.cast("string"), 256), n_chars=n_chars)
