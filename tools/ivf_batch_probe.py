"""Batched-IVF scaling receipts (round-9, VERDICT item 3).

Three claims priced with measured numbers (printed for SCALE.md):

1. **Per-query scored rows stay flat as the batch grows 10×** — a
   corpus row is scored once per query THAT PROBES ITS CELL, never once
   per query: scored-rows/query at batch 3 vs batch 30 must match
   (each query scores only its nprobe cells regardless of who else is
   in the batch; there is no cross-product term).
2. **Scored rows ∝ nprobe** — doubling the probed cells doubles the
   scored rows (cells are ~balanced under the seeded assignment).
3. **The composed retrieval path (PCA 4× compress → IVF probe → MMR
   re-rank) holds its wall across the sf0.1 → sf1 decade** — the MMR
   stage sees only the ANN top-N (corpus never enters Python), and the
   compressed IVF probe scans nprobe/nlist of the corpus.

    python tools/ivf_batch_probe.py [sf_dir ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from commerce_sessionization_spark.operators.ml import (  # noqa: E402
    pca_fit,
    pca_project,
)
from commerce_sessionization_spark.operators.similarity import (  # noqa: E402
    cosine_similarity,
    ivf_assign,
    mmr_rerank,
    seed_centroids,
)
from commerce_sessionization_spark.session import get_spark  # noqa: E402
from commerce_sessionization_spark.sources.tables import load_table  # noqa: E402

NLIST = 8


def _scored_rows(emb, cents, assigned, n_queries: int, nprobe: int) -> int:
    """Row count of the batched-IVF scored relation BEFORE the top-k
    window — the per-corpus-row work the plan actually does."""
    from pyspark.sql import Window

    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("_qid"), F.col("embedding").alias("_qvec")
    )
    pw = Window.partitionBy("_qid").orderBy(
        F.desc("_psim"), F.col("centroid_id")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(
            cents.select("centroid_id", F.col("embedding").alias("_cvec"))
        ))
        .select(
            "_qid", "_qvec", "centroid_id",
            cosine_similarity(F.col("_qvec"), F.col("_cvec")).alias("_psim"),
        )
        .withColumn("_rn", F.row_number().over(pw))
        .filter(F.col("_rn") <= nprobe)
        .select("_qid", "centroid_id")
    )
    return assigned.join(F.broadcast(probes), "centroid_id").count()


def probe(spark, sf_dir: str) -> None:
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    cents = seed_centroids(emb, nlist=NLIST)
    assigned = ivf_assign(emb, cents).localCheckpoint()
    print(f"{sf_dir}: corpus={n:,} nlist={NLIST}")

    # claim 1: batch 3 -> 30 at nprobe=2 — scored rows/query flat
    for nq in (3, 30):
        rows = _scored_rows(emb, cents, assigned, nq, nprobe=2)
        print(f"  batch={nq:3d} nprobe=2: scored={rows:>12,}  "
              f"per-query={rows / nq:>12,.0f}")
    # claim 2: nprobe 2/4/8 at batch=3 — scored rows proportional
    for np_ in (2, 4, 8):
        rows = _scored_rows(emb, cents, assigned, 3, nprobe=np_)
        print(f"  batch=  3 nprobe={np_}: scored={rows:>12,}  "
              f"per-query={rows / 3:>12,.0f}")

    # claim 3: composed PCA(16) compress -> IVF probe -> MMR, wall
    t0 = time.time()
    comps, mean, _ = pca_fit(emb, k=16, dim=64)
    corpus_c = pca_project(emb, comps, mean, out_col="pca", center=False)
    cents_c = seed_centroids(
        corpus_c.select("vec_id", F.col("pca").alias("embedding")),
        nlist=NLIST,
    )
    assigned_c = ivf_assign(
        corpus_c.select("vec_id", F.col("pca").alias("embedding")), cents_c
    )
    from commerce_sessionization_spark.operators.similarity import (
        ivf_search_many,
    )

    queries_c = corpus_c.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("pca").alias("embedding")
    )
    top = ivf_search_many(
        assigned_c, cents_c, queries_c, k=20, nprobe=2
    )
    cands = top.join(
        corpus_c.select("vec_id", F.col("pca").alias("embedding")), "vec_id"
    )
    out = mmr_rerank(
        cands, k=10, lam=0.5, query_col="query_id", id_col="vec_id",
        score_col="cosine", vec_col="embedding",
    ).count()
    print(f"  composed PCA16->IVF(nprobe=2)->MMR: rows={out} "
          f"wall={time.time() - t0:.1f}s")
    assigned.unpersist(blocking=False)


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
    spark = get_spark(app_name="ivf-batch-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        probe(spark, d)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
