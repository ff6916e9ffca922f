"""Leakage-safe split: near-dup pairs never straddle the split, and the
operator degrades to the plain hashed split on a pair-free corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.dedup import (
    ngram_jaccard_pairs,
)
from commerce_sessionization_spark.operators.sampling import (
    hash_split,
    leakage_safe_split,
)
from commerce_sessionization_spark.plans.queries import q_leakage_safe_split

SF_DIR = "/root/testdata/sf0.01"


def test_near_dup_pairs_never_straddle_the_split(spark):
    out = q_leakage_safe_split(spark, SF_DIR)
    from commerce_sessionization_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    a = out.select(F.col("doc_id").alias("a"), F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("b"), F.col("split").alias("sb"))
    straddling = (
        pairs.join(a, "a").join(b, "b").filter(F.col("sa") != F.col("sb"))
    )
    n_pairs = pairs.count()
    assert n_pairs > 0, "sf0.01 documents must contain near-dup pairs"
    assert straddling.count() == 0


def test_plain_split_does_leak_on_the_same_corpus(spark):
    """The motivating defect: a plain hashed split puts some near-dup
    pair on opposite sides of the 90/5/5 boundary on this corpus."""
    from commerce_sessionization_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    plain = hash_split(docs, "doc_id").select("doc_id", "split")
    a = plain.select(F.col("doc_id").alias("a"), F.col("split").alias("sa"))
    b = plain.select(F.col("doc_id").alias("b"), F.col("split").alias("sb"))
    leaked = pairs.join(a, "a").join(b, "b").filter(
        F.col("sa") != F.col("sb")
    )
    assert leaked.count() > 0


def test_singletons_match_plain_hash_split(spark):
    docs = spark.createDataFrame(
        [(i, f"unique text {i}") for i in range(200)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([], "a long, b long")
    safe = leakage_safe_split(docs, pairs).select("doc_id", "split")
    plain = hash_split(docs, "doc_id").select("doc_id", "split")
    assert {tuple(r) for r in safe.collect()} == {
        tuple(r) for r in plain.collect()
    }


def test_cluster_takes_its_representatives_side(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    # one component {0,3,7}, rest singletons
    pairs = spark.createDataFrame([(0, 3), (3, 7)], "a long, b long")
    out = leakage_safe_split(docs, pairs).collect()
    by_id = {r.doc_id: r for r in out}
    assert (
        by_id[0].component_id == by_id[3].component_id
        == by_id[7].component_id == 0
    )
    assert by_id[0].split == by_id[3].split == by_id[7].split
    # and that shared side is doc 0's own hashed side
    plain = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    assert by_id[3].split == plain[0]


def test_split_fractions_roughly_90_5_5(spark):
    docs = spark.createDataFrame(
        [(i, f"t {i}") for i in range(5000)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "a long, b long")
    frac = {
        r.split: r["count"] / 5000
        for r in leakage_safe_split(docs, pairs).groupBy("split").count().collect()
    }
    assert 0.87 < frac["train"] < 0.93
    assert 0.03 < frac["val"] < 0.07
    assert 0.03 < frac["test"] < 0.07
