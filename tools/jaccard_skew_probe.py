"""Measure the hot-shingle failure mode prefix filtering exists to fix.

The naive exact-Jaccard join (``ngram_jaccard_pairs``) keys its
self-join on EVERY shingle, so a boilerplate phrase shared by c docs
contributes c·(c−1)/2 joined rows per shingle — quadratic in the hot
bucket. ``prefix_jaccard_pairs`` only explodes each doc's
globally-rarest prefix shingles, so shared boilerplate (by definition
high-df) never reaches the join key.

This probe builds a corpus where every doc shares one boilerplate
sentence plus unique filler, then reports, for both operators:
  - joined candidate rows (naive: Σ_shingle c·(c−1)/2 computed from the
    df table — running the join itself is the thing that would melt;
    prefix: actual candidate count)
  - wall time of the full query (naive only at the small size)

    python tools/jaccard_skew_probe.py [n_docs ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.dedup import (
    _with_words,
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
    shingles_from_words,
)
from commerce_sessionization_spark.session import get_spark

BOILER = (
    "subscribe to our newsletter for the latest updates and exclusive "
    "offers delivered straight to your inbox every single week"
)


def make_docs(spark, n: int):
    # unique filler varies per doc; one shared boilerplate sentence
    return spark.range(n).selectExpr(
        "id AS doc_id",
        f"concat('{BOILER} ', 'doc ', id, ' body ', id * 7, ' tail ', id * 13)"
        " AS text",
    )


def shingle_df(docs, n=3):
    sh = _with_words(docs, "doc_id", "text").select(
        "_id", F.explode(shingles_from_words(F.col("_w"), n)).alias("shingle")
    )
    return sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("c"))


def naive_candidate_rows(docs) -> int:
    # Σ c·(c−1)/2 over the shingle df table == rows the naive self-join
    # materializes before its per-pair aggregation.
    row = (
        shingle_df(docs)
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"))
        .collect()[0]
    )
    return int(row["pairs"])


def prefix_candidate_rows(docs, threshold=0.8) -> int:
    from commerce_sessionization_spark.operators.dedup import (
        _prefix_ordered_and_candidates,
    )

    _, cands = _prefix_ordered_and_candidates(
        docs, "doc_id", "text", 3, threshold
    )
    return cands.count()


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [5000, 20000]
    spark = get_spark("jaccard-skew-probe")
    for n in sizes:
        docs = make_docs(spark, n).cache()
        docs.count()
        naive_rows = naive_candidate_rows(docs)
        t0 = time.time()
        n_prefix = prefix_jaccard_pairs(docs, threshold=0.8).count()
        t_prefix = time.time() - t0
        t_naive = None
        if n <= 5000:
            t0 = time.time()
            n_naive = ngram_jaccard_pairs(docs, threshold=0.8).count()
            t_naive = time.time() - t0
            assert n_naive == n_prefix, (n_naive, n_prefix)
        cand = prefix_candidate_rows(docs)
        print(
            f"n={n}: naive joined rows {naive_rows:,} "
            f"({naive_rows / n:,.0f} per doc) vs prefix candidates "
            f"{cand:,}; prefix wall {t_prefix:.1f}s"
            + (f", naive wall {t_naive:.1f}s" if t_naive is not None else
               " (naive join not run at this size)")
        )
        docs.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
