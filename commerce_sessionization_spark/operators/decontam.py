"""Benchmark decontamination: n-gram overlap between a training corpus and
an evaluation/benchmark set (north-star surface).

The standard pre-training hygiene step (GPT-3 appendix C, PaLM §6, Llama):
a training document is *contaminated* if it shares at least one word
n-gram with any benchmark document; contaminated docs are dropped (or the
overlapping spans surgically removed) so eval scores measure
generalization, not memorization.

Scale shape: the benchmark side is an eval suite — bounded (MBs, not TBs)
by construction — so its distinct-shingle set is broadcast and the 100 TB
training side is flagged map-side with NO shuffle of the corpus. That is
the one place in this engine where a broadcast of a derived set is
justified by a domain invariant rather than a size measurement (contrast:
``bigram_pmi`` deliberately does NOT broadcast its unbounded vocabulary).
The per-doc hit count does aggregate, but only over the (tiny) matched
subset, semi-join-pruned first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.dedup import (
    _with_words,
    shingles_from_words,
)


def _distinct_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(_id, shingle) — one row per distinct word n-gram per document."""
    return _with_words(df, id_col, text_col).select(
        "_id",
        F.explode(shingles_from_words(F.col("_w"), n, distinct=True)).alias(
            "shingle"
        ),
    )


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Per-train-doc count of distinct word n-grams shared with the
    benchmark set.

    Returns ``(doc_id, n_contaminated_ngrams)`` for every training document
    with ≥ 1 overlapping shingle (clean documents don't appear — at corpus
    scale the output is the small exception list, not a full-corpus
    annotation). Join both sides on the shingle string; the benchmark
    side collapses to its distinct shingle set first and is broadcast
    (eval suites are bounded by construction — see module docstring).

    ``decontaminate`` below is the companion filter that drops flagged docs.
    """
    train_sh = _distinct_shingles(train, id_col, text_col, n)
    bench_sh = (
        _distinct_shingles(benchmark, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    return (
        train_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(F.col("_id").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Training corpus minus contaminated documents (left-anti join against
    the flag list; the corpus side never shuffles — broadcast anti join)."""
    flagged = ngram_contamination(train, benchmark, id_col, text_col, n).select(
        id_col
    )
    return train.join(F.broadcast(flagged), id_col, "left_anti")


def semantic_contamination(
    train_vecs: DataFrame,
    bench_vecs: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space decontamination: for every train vector, the max
    cosine against ANY benchmark vector, plus the ≥ tau contamination
    flag — the semantic sibling of ``ngram_contamination`` (paraphrased
    or reformatted eval items share no n-grams but sit next to their
    source in embedding space; SemDeDup's cross-split variant).

    Scale shape: eval suites are bounded by construction, so the
    benchmark side BROADCASTS and the 100 TB train side is scored in
    whole-stage codegen and reduced by a map-side-combinable max — the
    train corpus never shuffles (the ``hard_negatives`` /
    ``ngram_decontaminate`` plan shape). Output: (id, max_cos,
    contaminated), one row per train vector.
    """
    from commerce_sessionization_spark.functions.vectors import (
        dot_product,
        l2_norm,
    )

    # An empty benchmark side would make the crossJoin drop EVERY train
    # row — a decontamination gate that silently passes with zero
    # coverage (ADVICE r9). The benchmark is bounded by construction,
    # so the emptiness probe is one cheap local scan; fail loudly.
    if bench_vecs.isEmpty():
        raise ValueError(
            "semantic_contamination: benchmark split is empty — the "
            "gate would pass every train row with zero coverage"
        )
    # norms hoisted out of the pair projection (cf. similarity.py): the
    # train norm computes once per row instead of once per (row, bench)
    # pair, the bench norms ride the broadcast — same doubles, same
    # dot/(|a|·|b|) parenthesization, so max_cos is bit-unchanged.
    b = F.broadcast(
        bench_vecs.select(
            F.col(vec_col).alias("_bvec"),
            l2_norm(F.col(vec_col)).alias("_bn"),
        )
    )
    return (
        train_vecs.select(
            F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("_tn")
        )
        .crossJoin(b)
        .select(
            id_col,
            (
                dot_product(F.col(vec_col), F.col("_bvec"))
                / (F.col("_tn") * F.col("_bn"))
            ).alias("_cos"),
        )
        .groupBy(id_col)
        .agg(F.max("_cos").alias("max_cos"))
        .withColumn("contaminated", F.col("max_cos") >= F.lit(tau))
    )
