"""Corpus shard writer: deterministic pseudo-random global shuffle into
N balanced shards + per-shard manifest — the last step of a
training-data pipeline before the trainer reads.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.layout import (
    shard_assignment,
    shard_manifest,
    write_shards,
)


def _docs(spark, n=600):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok word body "), F.col("id").cast("string")).alias(
            "text"
        ),
    )


def test_assignment_is_deterministic_and_total(spark):
    df = _docs(spark)
    a1 = shard_assignment(df, n_shards=16).select("doc_id", "shard_id")
    a2 = shard_assignment(df, n_shards=16).select("doc_id", "shard_id")
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    got = a1.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("shard_id").alias("lo"),
        F.max("shard_id").alias("hi"),
    ).first()
    assert got["n"] == 600 and got["lo"] >= 0 and got["hi"] <= 15


def test_shards_are_balanced(spark):
    # SHA-derived placement: at 600 docs / 8 shards the max/min ratio
    # stays well inside multinomial concentration bounds
    sizes = [
        r["n"]
        for r in shard_assignment(_docs(spark), n_shards=8)
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == 8
    assert max(sizes) / min(sizes) < 2.0


def test_shard_independent_of_split_hash(spark):
    # 'shard:' and 'split:' are distinct hash domains: the shard id must
    # not be a function of the split assignment (correlation would leak
    # eval docs into systematically different shards)
    from commerce_sessionization_spark.operators.sampling import hash_split

    df = hash_split(shard_assignment(_docs(spark), n_shards=2), "doc_id")
    counts = {
        (r["shard_id"], r["split"]): r["n"]
        for r in df.groupBy("shard_id", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # train docs (90%) must appear in BOTH shards, not segregate
    assert counts.get((0, "train"), 0) > 0 and counts.get((1, "train"), 0) > 0


def test_manifest_sums_equal_corpus_totals(spark):
    df = _docs(spark)
    m = shard_manifest(df, n_shards=8)
    tot = m.agg(
        F.sum("n_docs").alias("d"),
        F.sum("n_tokens").alias("t"),
        F.sum("n_bytes").alias("b"),
    ).first()
    exp = df.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum(F.size(F.split("text", " "))).alias("t"),
        F.sum(F.octet_length("text")).alias("b"),
    ).first()
    assert (tot["d"], tot["t"], tot["b"]) == (exp["d"], exp["t"], exp["b"])
    row = m.first()
    assert row["min_key"] <= row["max_key"]


def test_write_shards_layout_and_order(spark, tmp_path):
    df = _docs(spark, n=200)
    out = str(tmp_path / "shards")
    write_shards(df, out, n_shards=4)
    import os

    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("shard_id=")
    )
    assert dirs == [f"shard_id={i}" for i in range(4)]
    back = spark.read.parquet(out)
    assert back.count() == 200
    # within each shard file, rows are ordered by the shard key
    for i in range(4):
        part = spark.read.parquet(f"{out}/shard_id={i}")
        keys = [r["shard_key"] for r in part.select("shard_key").collect()]
        assert keys == sorted(keys)
    # idempotent rewrite: same rows, no dupes
    write_shards(df, out, n_shards=4)
    assert spark.read.parquet(out).count() == 200


def test_write_plan_has_single_exchange_no_global_sort(spark):
    df = _docs(spark)
    a = shard_assignment(df, n_shards=4)
    planned = a.repartition(4, F.col("shard_id")).sortWithinPartitions(
        "shard_id", "shard_key", "doc_id"
    )
    plan = planned._jdf.queryExecution().executedPlan().toString()
    # partition-local sort only ("], false, 0" = global=false), one
    # hash-partition shuffle, and no range partitioning (a global sort
    # would show rangepartitioning)
    assert "Sort [shard_id" in plan and "], false, 0" in plan
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()
