"""Deterministic dataset splitting / sampling helpers.

The catalog's hash-mod Bernoulli and stratified samplers live in
``plans/queries.py``; this module adds the train/val/test split every
training-data pipeline ends with. Everything is keyed on a SHA-256 of
the row id — deterministic across runs, engines, and partitionings (no
``rand()`` state), join-stable (the same id always lands in the same
split, so features computed in separate jobs can't leak across splits),
and mergeable (new data splits independently of old).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from commerce_sessionization_spark.functions.hashing import hex_to_long

#: Split-space resolution: weights are expressed in 1/10000ths.
SPLIT_BUCKETS = 10_000


def split_bucket(id_col: Column, seed: str = "split") -> Column:
    """Uniform bucket in [0, 10000) from sha256(seed ':' id)."""
    return (
        hex_to_long(F.sha2(F.concat(F.lit(f"{seed}:"), id_col.cast("string")), 256))
        % SPLIT_BUCKETS
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label by hashed id.

    ``weights`` maps label → fraction (must sum to ≤ 1; any remainder
    falls into the last label). Default 90/5/5 train/val/test.
    """
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    b = split_bucket(F.col(id_col), seed)
    expr: Column | None = None
    acc = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        acc += w
        cond = b < int(round(acc * SPLIT_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def weighted_priority(id_col: Column, weight_col: Column, seed: str = "ws") -> Column:
    """A-ES weighted-sampling priority: −ln(u)/w with u hash-derived.

    Efraimidis–Spirakis: taking the k SMALLEST priorities yields a
    weighted sample without replacement (inclusion odds ∝ weight).
    u = (sha-derived 60-bit int + 1) / 2^60 ∈ (0, 1] — deterministic
    across runs/engines (no rand() state), so the sample is reproducible
    and join-stable like every sampler here. The only non-integer step is
    ln(); selection flips require the k-th and (k+1)-th priorities within
    one ulp — vanishing for hash-random inputs.
    """
    h = hex_to_long(
        F.sha2(F.concat(F.lit(f"{seed}:"), id_col.cast("string")), 256)
    )
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    return -F.log(u) / weight_col.cast("double")


def weighted_sample(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    seed: str = "ws",
) -> DataFrame:
    """Deterministic weighted sample without replacement: k rows, chosen
    with probability proportional to ``weight_col`` (A-ES priorities +
    global top-k — TakeOrdered, no full sort materialization)."""
    p = weighted_priority(F.col(id_col), F.col(weight_col), seed)
    return (
        df.withColumn("_priority", p)
        .orderBy("_priority")
        .limit(k)
        .drop("_priority")
    )
