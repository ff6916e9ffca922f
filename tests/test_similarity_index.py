"""On-disk IVF index: the partition-pruning claim, measured.

SCALE.md says probing the centroid-partitioned layout skips
(1 − nprobe/nlist) of the corpus at the file-listing level; these tests
assert it from the actual scan — the probe must read files from exactly
the probed directories, return the same rows as the in-memory search,
and show the centroid filter as a partition filter (not a post-scan
predicate)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.similarity import (
    ivf_assign,
    ivf_search,
    ivf_search_on_disk,
    ivf_write_index,
    seed_centroids,
)
from commerce_sessionization_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _build(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = seed_centroids(emb, nlist=16)
    assigned = ivf_assign(emb, cents)
    path = str(tmp_path / "ivf_index")
    ivf_write_index(assigned, path)
    return emb, cents, assigned, path


def test_on_disk_probe_matches_in_memory(spark, tmp_path):
    emb, cents, assigned, path = _build(spark, tmp_path)
    query = emb.filter(F.col("vec_id") == 0)
    mem = ivf_search(assigned, cents, query, k=10, nprobe=4).collect()
    disk = ivf_search_on_disk(spark, path, cents, query, k=10, nprobe=4).collect()
    assert [(r.vec_id, round(r.cosine, 9)) for r in disk] == [
        (r.vec_id, round(r.cosine, 9)) for r in mem
    ]


def test_probe_scans_only_probed_partitions(spark, tmp_path):
    emb, cents, assigned, path = _build(spark, tmp_path)
    query = emb.filter(F.col("vec_id") == 0)
    out = ivf_search_on_disk(spark, path, cents, query, k=10, nprobe=4)
    # files ACTUALLY read (input_file_name is post-pruning; inputFiles()
    # would list the relation's whole file index) sit under ≤ nprobe dirs
    read_files = [
        r[0]
        for r in spark.read.parquet(path)
        .where(F.col("centroid_id").isin([1, 2, 3, 4]))
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    assert read_files
    dirs = {re.search(r"centroid_id=(\d+)", f).group(1) for f in read_files}
    assert 0 < len(dirs) <= 4, dirs
    # and the filter is a partition filter, pruned before the scan —
    # not a row-level predicate after reading everything
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*centroid_id", plan), plan


def test_full_probe_equals_brute_force(spark, tmp_path):
    from commerce_sessionization_spark.operators.similarity import brute_force_topk

    emb, cents, assigned, path = _build(spark, tmp_path)
    query = emb.filter(F.col("vec_id") == 0)
    exhaustive = brute_force_topk(emb, query, k=10).collect()
    full_probe = ivf_search_on_disk(
        spark, path, cents, query, k=10, nprobe=16
    ).collect()
    assert [r.vec_id for r in full_probe] == [r.vec_id for r in exhaustive]


def test_jl_preserves_distances_in_aggregate(spark):
    """JL lemma, measured: mean ratio near 1, spread bounded on the
    testdata embeddings (deterministic matrix, fixed data)."""
    import statistics

    from commerce_sessionization_spark.plans.queries import (
        q_jl_distance_ratios,
    )

    rows = q_jl_distance_ratios(spark, "/root/testdata/sf0.001").collect()
    ratios = [r.ratio_q4 / 10_000 for r in rows]
    assert len(ratios) == 250
    mu = statistics.mean(ratios)
    assert 0.9 <= mu <= 1.1, mu
    # 16 dims -> sigma ~ 1/sqrt(2*16) ~ 0.18; nothing should be wild
    assert min(ratios) > 0.4 and max(ratios) < 1.8


def test_jl_projection_is_narrow_plan(spark, tmp_path):
    import re

    from commerce_sessionization_spark.operators.similarity import jl_project

    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    p = str(tmp_path / "emb")
    emb.write.parquet(p)
    out = jl_project(spark.read.parquet(p), in_dim=8, out_dim=4)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan


# ---------------------------------------------------------------------------
# Scalar quantization (int8) tier
# ---------------------------------------------------------------------------


def _sq_coded(spark):
    from commerce_sessionization_spark.operators.similarity import (
        sq_bounds,
        sq_encode,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    bounds = sq_bounds(emb, dim=64).localCheckpoint()
    return emb, sq_encode(emb, bounds)


def test_sq_codes_in_range_and_extremes_hit_grid_ends(spark):
    coded = _sq_coded(spark)[1]
    stats = coded.select(
        F.array_min("sq_code").alias("lo"), F.array_max("sq_code").alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert stats["lo"] == 0 and stats["hi"] == 255
    # every dimension's min/max rows land on the grid ends: some row
    # codes 0 and some row codes 255 in each dim
    per_dim = coded.select(
        F.posexplode("sq_code").alias("i", "c")
    ).groupBy("i").agg(F.min("c").alias("mn"), F.max("c").alias("mx"))
    bad = per_dim.filter((F.col("mn") != 0) | (F.col("mx") != 255)).count()
    assert bad == 0


def test_sq_degenerate_dimension_codes_zero(spark):
    from pyspark.sql import Row

    from commerce_sessionization_spark.operators.similarity import (
        sq_bounds,
        sq_encode,
    )

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 7.0]) for i in range(4)]
    )
    coded = sq_encode(df, sq_bounds(df, dim=2))
    assert all(r.sq_code[1] == 0 for r in coded.collect())
    assert {r.sq_code[0] for r in coded.collect()} == {0, 85, 170, 255}


def test_sq_topk_recall_vs_exact_cosine(spark):
    """256-level quantization of unit-ish embeddings must keep most of
    the exact top-10 (the compression/recall trade documented for SQ)."""
    from commerce_sessionization_spark.operators.similarity import (
        brute_force_topk,
        sq_topk,
    )

    emb, coded = _sq_coded(spark)
    exact = {
        r.vec_id
        for r in brute_force_topk(
            emb, emb.filter(F.col("vec_id") == 0), k=10
        ).collect()
    }
    got = {
        r.vec_id
        for r in sq_topk(
            coded, coded.filter(F.col("vec_id") == 0), k=10
        ).collect()
    }
    assert len(exact & got) >= 7, (exact, got)
