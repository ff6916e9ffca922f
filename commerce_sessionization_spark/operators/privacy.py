"""Privacy / anonymization operators (north-star surface).

A training-data pipeline that ingests user-generated or transactional
data needs release hygiene beyond PII regex scrubbing
(``operators/text.py``): group-level re-identification control. This
module implements the three standard table-release primitives —
k-anonymity, l-diversity, and a Laplace noise mechanism — as plain
aggregations and column expressions, fully JVM-side.

Scale notes (100 TB):

- Group sizing uses ``groupBy`` + a co-partitioned join-back on the
  quasi-identifier key, NOT ``count().over(Window.partitionBy(qi))``:
  WindowExec buffers an entire partition per key, so one hot QI cell
  (e.g. ``(US, NULL, NULL)`` after generalization) would OOM an
  executor, while hash aggregation streams with map-side partial
  combine and the join-back shuffles both sides on the same key (one
  exchange each, AQE-coalesced).
- The noise column is a deterministic scalar expression per output row
  (sha256 → uniform → inverse-CDF Laplace); no shuffle beyond the
  count's own aggregation.

Determinism caveat, stated loudly: ``laplace_noise`` derives its
uniform from ``sha256(seed || key)``, so the "noise" is a pure function
of the group key and seed. That makes pipelines replayable and
cross-engine testable (the DuckDB oracle recomputes it bit-for-bit),
but it is NOT a differentially-private release: an adversary who knows
the seed can subtract the noise. For a real DP release, swap the hash
uniform for fresh entropy (e.g. ``F.rand()`` seeded per release, or an
external DRBG) and keep the identical inverse-CDF shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def group_sizes(
    df: DataFrame, quasi_cols: list[str], out_col: str = "qi_count"
) -> DataFrame:
    """Size of each quasi-identifier equivalence class (one hash agg)."""
    return df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias(out_col))


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Equivalence classes violating k-anonymity: QI columns + class size
    for every class with fewer than ``k`` rows. Empty output ⇔ the table
    is k-anonymous over ``quasi_cols``."""
    return group_sizes(df, quasi_cols).filter(F.col("qi_count") < k)


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    redact: str = "*",
) -> DataFrame:
    """Suppression-based k-anonymization: rows in an equivalence class
    smaller than ``k`` get every quasi-identifier replaced by
    ``redact``; rows in large-enough classes keep theirs (stringified,
    so the column type is uniform). Non-QI columns pass through.

    Suppression (not generalization) keeps the operator a pure
    column-expression pass after one aggregation; generalization
    hierarchies (city→region→country) compose as an upstream
    ``withColumn`` before calling this.

    NULL quasi-identifier values form their own equivalence class (the
    same grouping SQL's ``PARTITION BY`` uses), so the join-back is
    null-SAFE equality — a plain equi-join would leave NULL-QI rows
    unmatched and therefore UNREDACTED, the worst failure mode for a
    privacy operator. Unmatched rows (impossible after the null-safe
    join, but cheap to guard) count as a class of zero and redact.
    """
    d, s = df.alias("_d"), group_sizes(df, quasi_cols).alias("_s")
    cond = None
    for c in quasi_cols:
        eq = F.col(f"_d.{c}").eqNullSafe(F.col(f"_s.{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = d.join(s, cond, "left")
    small = F.coalesce(F.col("qi_count"), F.lit(0)) < k
    out_cols = [
        F.when(small, F.lit(redact))
        .otherwise(F.col(f"_d.{c}").cast("string"))
        .alias(c)
        if c in quasi_cols
        else F.col(f"_d.{c}").alias(c)
        for c in df.columns
    ]
    return joined.select(*out_cols)


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,  # noqa: E741 — the literature's name
) -> DataFrame:
    """Equivalence classes violating distinct l-diversity: QI columns +
    class size + number of distinct sensitive values, for classes with
    fewer than ``l`` distinct sensitive values. k-anonymity bounds class
    SIZE; this bounds what a class reveals — a 50-row class whose
    sensitive attribute is constant is 50-anonymous and still leaks."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("qi_count"),
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < l)
    )


def laplace_noise(key: Column, scale: float, seed: str = "dp") -> Column:
    """Deterministic Laplace(0, scale) noise keyed on ``key`` (see the
    module caveat: replayable mechanism shape, not a DP release).

    u = (sha-derived 52-bit int + 0.5) / 2^52 ∈ (0, 1) — the half-up
    offset keeps u off both endpoints, so ln(1 − 2|u−½|) is finite.
    52 bits (not 60) so the double arithmetic is EXACT: a 60-bit hash
    cast to double rounds, and any h within one ulp of 2^60 collapsed
    u onto the 1.0 endpoint, making the log blow up after all.
    Inverse CDF: noise = −scale · sign(u−½) · ln(1 − 2|u−½|).
    """
    from commerce_sessionization_spark.functions.hashing import (
        stable_long_hash,
    )

    h = stable_long_hash(
        F.concat(F.lit(f"{seed}:"), key.cast("string")), n_chars=13
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    t = u - F.lit(0.5)
    return (
        F.lit(-scale)
        * F.signum(t)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(t))
    )


def _enc_key_part(col_name: str) -> Column:
    """Prefix-free token for one group-key component (see
    ``dp_noisy_counts``): 'n' for NULL, else 'v<len>:<value>'."""
    s = F.col(col_name).cast("string")
    return F.when(s.isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v"), F.length(s).cast("string"), F.lit(":"), s)
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Histogram release under the Laplace mechanism: per-group exact
    count plus Laplace(1/ε) noise (sensitivity of a count is 1). Output
    keeps both the exact and noisy counts so callers can drop the exact
    column at release time.

    The noise key is a PREFIX-FREE encoding of the group tuple — per
    column ``'n'`` for NULL, else ``'v' + len + ':' + value`` — because
    a naive delimiter concat collides: ``concat_ws`` skips NULLs, so
    ``(NULL,'x')`` and ``('x',NULL)`` would share one noise draw, and a
    value containing the delimiter shifts the boundary. Correlated
    noise across cells breaks the histogram mechanism's per-cell
    independence; length-prefixing makes the key injective."""
    key = F.concat(*[_enc_key_part(c) for c in group_cols])
    return group_sizes(df, group_cols, out_col="exact_count").select(
        *group_cols,
        "exact_count",
        (
            F.col("exact_count").cast("double")
            + laplace_noise(key, 1.0 / epsilon, seed)
        ).alias("noisy_count"),
    )
