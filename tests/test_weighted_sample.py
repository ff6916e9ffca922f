"""Weighted sampling (A-ES): bias toward weight, determinism, top-k plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from commerce_sessionization_spark.plans.queries import q_weighted_sample_docs
from commerce_sessionization_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_weighted_sample_biases_toward_long_docs(spark):
    sample = q_weighted_sample_docs(spark, SF_DIR)
    corpus_mean = (
        load_table(spark, SF_DIR, "documents")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_mean = sample.agg(F.avg("n_chars")).collect()[0][0]
    # inclusion probability ∝ n_chars ⇒ the sample skews measurably long
    assert sample_mean > 1.2 * corpus_mean, (sample_mean, corpus_mean)


def test_weighted_sample_is_deterministic(spark):
    a = {r.doc_id for r in q_weighted_sample_docs(spark, SF_DIR).collect()}
    b = {r.doc_id for r in q_weighted_sample_docs(spark, SF_DIR).collect()}
    assert a == b and len(a) == 100


def test_weighted_sample_plans_take_ordered_not_global_sort(spark):
    df = q_weighted_sample_docs(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    # the top-k must not plan a full sort-shuffle of the corpus
    assert "Exchange rangepartitioning" not in plan


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """DSIR (Xie et al. 2023): a raw document sharing the target
    corpus's hashed-bigram profile must score above one that shares
    nothing, and weights must be finite for every doc with >= 1 bigram
    (add-one smoothing covers unseen buckets)."""
    from commerce_sessionization_spark.operators.sampling import dsir_weights

    target = spark.createDataFrame(
        [(100 + i, "quantum flux capacitor alignment theory") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "quantum flux capacitor alignment"),      # target-like
            (2, "cheap pills casino jackpot winner now"), # off-target
            (3, "quantum flux"),                          # 1 shared bigram
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dsir_weights(raw, target).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_grams"] == 3
    assert rows[1]["dsir_w_q6"] > rows[3]["dsir_w_q6"] > rows[2]["dsir_w_q6"]
    assert rows[2]["dsir_w_q6"] < 0  # off-target profile is penalized
