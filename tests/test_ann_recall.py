"""IVF ANN accuracy/cost trade-off: measured recall@k vs nprobe.

Two fixtures, two claims (numbers recorded in SCALE.md):

1. The real ``embeddings`` testdata is ISOTROPIC random (within-label and
   cross-label mean cosine are both ~0.0 — verified below), the worst
   case for any partition-pruning index: a query's true neighbors
   scatter across cells, so recall is bounded by the data, not the
   implementation. We pin the measured curve — monotone in nprobe,
   comfortably above the probed-cell fraction (the index still
   concentrates neighbors ~2-5x better than random cell assignment),
   and exactly 1.0 at nprobe = nlist (exhaustive probe == brute force).
2. On data WITH cluster structure — what real embedding corpora have —
   the same index at the same settings reaches recall@10 >= 0.9 at
   nprobe=4 of nlist=16 (measured 1.0 on the deterministic clustered
   fixture). The pruning is the point: 4/16 probes -> 75% of the corpus
   never scanned.
"""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_search,
    kmeans_fit,
)
from commerce_sessionization_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
NLIST = 16
K = 10
QUERY_IDS = [0, 50, 100, 150, 200, 250, 300, 350, 400, 450]


def _recall_curve(spark, emb, nprobes, query_ids):
    cents = kmeans_fit(emb, k=NLIST, max_iter=10).localCheckpoint()
    assigned = ivf_assign(emb, cents).localCheckpoint()
    queries = {
        qid: emb.filter(F.col("vec_id") == qid).select("embedding")
        for qid in query_ids
    }
    truth = {
        qid: {r["vec_id"] for r in brute_force_topk(emb, q, k=K).collect()}
        for qid, q in queries.items()
    }
    curve = {}
    for nprobe in nprobes:
        recs = []
        for qid, q in queries.items():
            got = {
                r["vec_id"]
                for r in ivf_search(
                    assigned, cents, q, k=K, nprobe=nprobe
                ).collect()
            }
            recs.append(len(got & truth[qid]) / K)
        curve[nprobe] = sum(recs) / len(recs)
    return curve


@pytest.fixture(scope="module")
def isotropic_curve(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    return _recall_curve(spark, emb, (1, 2, 4, 8, 16), QUERY_IDS)


def test_testdata_embeddings_are_isotropic(spark):
    """Establish the premise: no label/cluster structure in the fixture
    (mean within-label cosine ~ 0), so recall < 1 at nprobe < nlist is a
    data property, not an index defect."""
    emb = load_table(spark, SF_DIR, "embeddings")
    from commerce_sessionization_spark.functions.vectors import (
        cosine_similarity,
    )

    a = emb.select(F.col("vec_id").alias("a"), F.col("label").alias("la"),
                   F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("label").alias("lb"),
                   F.col("embedding").alias("vb"))
    stats = (
        a.join(b, F.col("a") < F.col("b"))
        .select((F.col("la") == F.col("lb")).alias("same"),
                cosine_similarity(F.col("va"), F.col("vb")).alias("cos"))
        .groupBy("same").agg(F.avg("cos").alias("m"))
        .collect()
    )
    for r in stats:
        assert abs(r["m"]) < 0.05


def test_recall_monotone_and_beats_random_pruning(isotropic_curve):
    c = isotropic_curve
    assert c[1] <= c[2] <= c[4] <= c[8] <= c[16] + 1e-9
    # random cell assignment would give recall ~ nprobe/nlist; the index
    # concentrates true neighbors into the query's nearest cells even on
    # isotropic data (measured ~.32/.47/.65/.84 for 1/2/4/8 probes).
    # the 2x-over-random claim only makes sense while 2*nprobe/nlist < 1
    for nprobe in (1, 2, 4):
        assert c[nprobe] >= 2 * nprobe / NLIST, c
    # regression floors just under the measured curve
    assert c[4] >= 0.55, c
    assert c[8] >= 0.75, c


def test_exhaustive_probe_equals_brute_force(isotropic_curve):
    assert isotropic_curve[16] == pytest.approx(1.0)


def test_clustered_corpus_recall_at_nprobe4(spark):
    """The headline accuracy/cost point: on cluster-structured data
    (16 well-separated centers, the shape real corpora have), recall@10
    >= 0.9 while probing only 4/16 cells."""
    rng = random.Random(1234)
    dim, n = 32, 480
    centers = [
        [rng.gauss(0, 1) for _ in range(dim)] for _ in range(NLIST)
    ]
    centers = [
        [x / math.sqrt(sum(v * v for v in c)) for x in c] for c in centers
    ]
    rows = []
    for i in range(n):
        c = centers[i % NLIST]
        rows.append((i, [x + rng.gauss(0, 0.08) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    curve = _recall_curve(spark, emb, (4,), [0, 33, 77, 121, 240, 361])
    assert curve[4] >= 0.9, curve
