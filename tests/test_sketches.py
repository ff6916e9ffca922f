"""Sketch + TPC-H-shaped query additions: accuracy and plan properties.

The value-level cross-engine gate is the DuckDB oracle
(tools/check_oracle.py); these tests pin the *semantics* that the oracle
can't see — estimator accuracy vs exact counts, structural invariants,
and the physical-plan properties that matter at 100 TB.
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from commerce_sessionization_spark.plans.queries import all_spark_queries
from tests.test_plans import node_count, plan_of

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    return all_spark_queries()


def test_kmv_estimate_accuracy(spark, queries):
    rows = queries["kmv_distinct_users"](spark, SF_DIR).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in queries["event_type_stats"](spark, SF_DIR)
        .select(F.col("event_type"), F.col("n_users").alias("n"))
        .collect()
    }
    assert rows, "expected ≥64 distinct users per type at sf0.01"
    for r in rows:
        rel = abs(r["est_distinct"] - exact[r["event_type"]]) / exact[r["event_type"]]
        # KMV k=64 → relative σ ≈ 1/√(k−2) ≈ 12.7%; allow 4σ
        assert rel < 0.5, (r, exact[r["event_type"]])


def test_hll_estimate_accuracy(spark, queries):
    row = queries["hll_distinct_users"](spark, SF_DIR).collect()[0]
    exact = row["exact_distinct"]
    # m=64 → relative σ ≈ 1.04/√64 = 13%; allow 4σ
    assert abs(row["est_distinct"] - exact) / exact < 0.52, row
    assert 1 <= row["n_filled"] <= 64


def test_hll_registers_are_mergeable_state(spark, queries):
    regs = queries["hll_registers"](spark, SF_DIR).collect()
    assert 1 <= len(regs) <= 64
    for r in regs:
        assert 0 <= r["bucket"] < 64
        assert 1 <= r["max_rho"] <= 55


def test_lang_centroids_cover_every_dim(spark, queries):
    rows = queries["lang_centroids"](spark, SF_DIR).collect()
    langs = {r["lang"] for r in rows}
    assert len(rows) == 64 * len(langs)  # every (lang, dim) cell present
    per_dim_docs = sum(r["n_docs"] for r in rows) // 64
    assert per_dim_docs == 500  # all docs joined to their embedding


def test_shipping_priority_is_ranked_top10(spark, queries):
    rows = queries["shipping_priority"](spark, SF_DIR).collect()
    assert len(rows) == 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_forecast_revenue_pushes_all_filters(spark, queries):
    plan = plan_of(queries["forecast_revenue"](spark, SF_DIR))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in m.group(1), plan


def test_disjunctive_join_broadcasts_part(spark, queries):
    plan = plan_of(queries["disjunctive_part_revenue"](spark, SF_DIR))
    assert node_count(plan, "BroadcastHashJoin") >= 1, plan
    assert node_count(plan, "SortMergeJoin") == 0, plan


def test_large_volume_orders_partial_aggregates(spark, queries):
    # the HAVING-filtered agg must map-side combine before its shuffle
    plan = plan_of(queries["large_volume_orders"](spark, SF_DIR))
    assert node_count(plan, "HashAggregate") >= 2, plan


def test_cms_estimate_upper_bounds_exact(spark, queries):
    rows = queries["cms_heavy_hitters"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["est"] >= r["exact_cnt"], (r["token"], r["est"], r["exact_cnt"])
    # with 31 tokens in 4x256 cells, collisions should be rare: the
    # estimate must be exact for most keys, or the sketch is broken
    exact_hits = sum(1 for r in rows if r["est"] == r["exact_cnt"])
    assert exact_hits >= len(rows) * 0.8


def test_cms_cells_merge_across_splits(spark, queries):
    """Sum-merging per-split sketches must equal the global sketch — the
    property that lets day-level sketches fold at 100 TB."""
    from commerce_sessionization_spark.operators.sketches import count_min_cells
    from commerce_sessionization_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    whole = {
        (r["r_idx"], r["c_idx"]): r["cnt"]
        for r in count_min_cells(toks, "tok").collect()
    }
    merged: dict = {}
    for half in (toks.where("doc_id % 2 = 0"), toks.where("doc_id % 2 = 1")):
        for r in count_min_cells(half, "tok").collect():
            k = (r["r_idx"], r["c_idx"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert merged == whole


def test_histogram_sketch_merges_and_bounds_quantiles(spark):
    from commerce_sessionization_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )
    from commerce_sessionization_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    whole = {
        r["bucket"]: r["cnt"]
        for r in histogram_sketch(li, "l_extendedprice", 100.0).collect()
    }
    merged: dict = {}
    for half in (li.where("l_orderkey % 2 = 0"), li.where("l_orderkey % 2 = 1")):
        for r in histogram_sketch(half, "l_extendedprice", 100.0).collect():
            merged[r["bucket"]] = merged.get(r["bucket"], 0) + r["cnt"]
    assert merged == whole

    # estimates land within one bucket width of the exact percentiles
    ests = {
        r["p"]: r["est"]
        for r in histogram_quantiles(li, "l_extendedprice", 100.0).collect()
    }
    exact = li.agg(
        F.expr(
            "percentile(l_extendedprice, array(0.5, 0.95, 0.99))"
        ).alias("q")
    ).first()["q"]
    for p, ex in zip((0.5, 0.95, 0.99), exact):
        assert abs(ests[p] - ex) <= 100.0, (p, ests[p], ex)


def test_bottomk_sample_is_mergeable(spark):
    """bottom-k of a union == bottom-k of the parts' bottom-ks — the
    property that lets the sample reduce tree-wise at scale."""
    from commerce_sessionization_spark.operators.sketches import bottomk_sample

    a = spark.range(0, 3000).selectExpr("id", "id * 2 AS v")
    b = spark.range(3000, 6000).selectExpr("id", "id * 2 AS v")
    k = 64
    direct = bottomk_sample(a.unionAll(b), "id", k=k, keep_cols=("v",))
    merged = bottomk_sample(
        bottomk_sample(a, "id", k=k, keep_cols=("v",)).unionAll(
            bottomk_sample(b, "id", k=k, keep_cols=("v",))
        ),
        "id",
        k=k,
        keep_cols=("v",),
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_sample_quantiles_rank_selection(spark):
    from pyspark.sql import Row

    from commerce_sessionization_spark.operators.sketches import sample_quantiles

    # 10 known values; ceil(0.5*10)=5 -> 50, ceil(0.9*10)=9 -> 90
    df = spark.createDataFrame(
        [Row(id=i, value=float((i + 1) * 10)) for i in range(10)]
    )
    got = {
        r.p: r.q_value
        for r in sample_quantiles(
            df, "value", "id", percentiles=(0.5, 0.9)
        ).collect()
    }
    assert got == {0.5: 50.0, 0.9: 90.0}


def test_sampled_quantiles_track_population(spark):
    """256-row sample medians of 50k uniform values must sit within a
    few percent of the true quantiles (O(1/sqrt(k)) order-stat bound)."""
    from commerce_sessionization_spark.operators.sketches import (
        bottomk_sample,
        sample_quantiles,
    )

    df = spark.range(0, 50_000).selectExpr("id", "CAST(id AS DOUBLE) AS value")
    s = bottomk_sample(df, "id", k=256, keep_cols=("value",))
    got = {
        r.p: r.q_value
        for r in sample_quantiles(s, "value", "id", (0.5, 0.9)).collect()
    }
    assert abs(got[0.5] - 25_000) < 5_000
    assert abs(got[0.9] - 45_000) < 5_000


def test_cms_join_size_upper_bounds_and_tracks_truth(spark):
    """The inner-product estimate never under-counts (collisions only
    add), and with width >> distinct keys it is exact."""
    from commerce_sessionization_spark.operators.sketches import (
        cms_join_size_estimate,
        count_min_cells,
    )

    a = spark.range(0, 3000).selectExpr("CAST(id % 40 AS STRING) AS k")
    b = spark.range(0, 500).selectExpr("CAST(id % 40 AS STRING) AS k")
    est = cms_join_size_estimate(
        count_min_cells(a, "k"), count_min_cells(b, "k")
    ).collect()[0]["est_join_size"]
    exact = a.join(b, "k").count()
    assert est >= exact
    # 40 distinct keys in a 256-wide sketch: few collisions; the min-row
    # bound should land within 2x of truth
    assert est <= 2 * exact, (est, exact)


def test_cms_join_size_disjoint_keys_estimates_near_zero(spark):
    from commerce_sessionization_spark.operators.sketches import (
        cms_join_size_estimate,
        count_min_cells,
    )

    a = spark.range(0, 1000).selectExpr("CAST(id AS STRING) AS k")
    b = spark.range(100000, 101000).selectExpr("CAST(id AS STRING) AS k")
    est = cms_join_size_estimate(
        count_min_cells(a, "k"), count_min_cells(b, "k")
    ).collect()[0]["est_join_size"]
    # true join is 0; 1000 keys in 256 cells collide, so the bound is
    # loose but must stay far below the 10^6 cross-product mass
    assert est < 50_000, est


def test_grouped_histogram_quantiles_match_per_group_truth(spark):
    """Uniform 0..N-1 values per group: p-quantile estimate must land
    within one bucket of p*N, independently per group."""
    from commerce_sessionization_spark.operators.sketches import (
        grouped_histogram_quantiles,
    )

    a = spark.range(0, 10_000).selectExpr("'a' AS g", "CAST(id AS DOUBLE) AS v")
    b = spark.range(0, 1_000).selectExpr("'b' AS g", "CAST(id * 5 AS DOUBLE) AS v")
    df = a.unionAll(b)
    got = {
        (r.g, r.p): r.est
        for r in grouped_histogram_quantiles(
            df, "g", "v", bucket_width=100.0, percentiles=(0.5, 0.95)
        ).collect()
    }
    assert abs(got[("a", 0.5)] - 5_000) <= 100
    assert abs(got[("a", 0.95)] - 9_500) <= 100
    assert abs(got[("b", 0.5)] - 2_500) <= 100
    assert abs(got[("b", 0.95)] - 4_750) <= 100


def test_grouped_histogram_quantiles_single_row_group(spark):
    from commerce_sessionization_spark.operators.sketches import (
        grouped_histogram_quantiles,
    )

    df = spark.createDataFrame([("solo", 42.0)], "g string, v double")
    got = grouped_histogram_quantiles(df, "g", "v", 10.0, (0.5,)).collect()
    assert len(got) == 1 and 40.0 <= got[0].est <= 50.0
