"""Product-quantization invariants: code validity, seed self-coding,
ADC retrieval quality on a clustered fixture, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.pq import (
    PQ_K,
    PQ_M,
    pq_adc_multi,
    pq_adc_topk,
    pq_codebook,
    pq_encode,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """4 well-separated clusters in 64-dim, 30 vectors each, tight noise.

    vec_id // 30 is the ground-truth cluster label."""
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 10.0, size=(4, 64))
    rows = []
    for i in range(120):
        v = centers[i // 30] + rng.normal(0, 0.5, size=64)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codes_shape_and_range(clustered):
    cents = pq_codebook(clustered)
    codes = pq_encode(clustered, cents)
    rows = codes.collect()
    assert len(rows) == 120
    for r in rows:
        assert len(r.codes) == PQ_M
        assert all(0 <= c < PQ_K for c in r.codes)


def test_seed_vectors_code_to_themselves(clustered):
    """A seed vector's subvector IS centroid (j, c): distance 0, so its
    code must be its own seed rank in every subspace."""
    from commerce_sessionization_spark.functions.hashing import hex_to_long

    cents = pq_codebook(clustered)
    h = hex_to_long(
        F.sha2(F.concat(F.lit("pq:"), F.col("vec_id").cast("string")), 256)
    )
    seed_ids = [
        r.vec_id
        for r in clustered.select("vec_id", h.alias("_h"))
        .orderBy("_h", "vec_id")
        .limit(PQ_K)
        .collect()
    ]
    codes = {r.vec_id: r.codes for r in pq_encode(clustered, cents).collect()}
    for rank, vid in enumerate(seed_ids):
        assert codes[vid] == [rank] * PQ_M, (vid, rank, codes[vid])


def test_adc_retrieves_same_cluster(clustered):
    """ADC top-10 for a query should come from the query's own cluster —
    the centers are 20σ apart, so even a seeded (untrained) codebook
    separates them."""
    cents = pq_codebook(clustered)
    codes = pq_encode(clustered, cents)
    qv = clustered.filter(F.col("vec_id") == 5).collect()[0].embedding
    top = pq_adc_topk(codes, cents, list(qv), k=10).collect()
    same = sum(1 for r in top if r.vec_id // 30 == 0)
    assert same >= 9, [r.vec_id for r in top]


def test_adc_multi_ranks_per_query(clustered):
    cents = pq_codebook(clustered)
    codes = pq_encode(clustered, cents)
    qs = [
        (r.vec_id, list(r.embedding))
        for r in clustered.filter(F.col("vec_id").isin([5, 65])).collect()
    ]
    out = pq_adc_multi(codes, cents, qs, k=5).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {5, 65}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        # distances nondecreasing with rank
        dists = [r.adc_dist for r in rows]
        assert dists == sorted(dists)
        # the query's own cluster dominates
        want = qid // 30
        assert sum(1 for r in rows if r.vec_id // 30 == want) >= 4


def test_encode_deterministic(clustered):
    cents = pq_codebook(clustered)
    a = sorted(map(tuple, pq_encode(clustered, cents).collect()))
    b = sorted(map(tuple, pq_encode(clustered, cents).collect()))
    assert a == b


def test_encode_plan_is_narrow(clustered, tmp_path):
    """Encoding shuffles nothing: scan → project, no Exchange."""
    import re

    p = str(tmp_path / "emb")
    clustered.write.parquet(p)
    cents = pq_codebook(clustered)
    out = pq_encode(clustered.sparkSession.read.parquet(p), cents)
    plan = out._jdf.queryExecution().explainString(
        clustered.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
