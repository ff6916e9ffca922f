"""Degenerate-input robustness: catalog queries on EMPTY tables.

A pipeline's first production incident is usually an empty partition —
a source gap, a new tenant, a filter that matched nothing. Every query
here must return an empty (or well-defined) result instead of crashing
on a driver-side scalar that doesn't exist. The full-catalog sweep ran
once offline (172/179 already clean; pagerank's uniform-rank division
and the BFS source-pick were the fixes); this test pins the previously-
crashing shapes plus one representative per major family so the
property can't rot.
"""

from __future__ import annotations

import pytest

from commerce_sessionization_spark.plans.queries import all_spark_queries
from commerce_sessionization_spark.schemas import ALL_TESTDATA_TABLES
from commerce_sessionization_spark.sources.tables import load_table

PINNED = [
    # previously crashed (ZeroDivisionError / int(None))
    "pagerank_copurchase",
    "pagerank_copurchase_fast",
    "pagerank_neardup",
    "pagerank_neardup_fast",
    "part_hop_distances",
    "part_weighted_distances",
    # one per family: window chain, agg, join, dedup, sketch, tier-b,
    # iterative graph, timeseries, profiling
    "sessionize_events",
    "pricing_summary",
    "revenue_by_nation",
    "exact_dedup_docs",
    "kmv_distinct_users",
    "pack_sequences",
    "kcore_parts",
    "event_gapfill_interp",
    "holt_daily_revenue",
    "orders_profile",
    "event_transition_matrix",
    "conversion_funnel_24h",
    # round-5 second-rotation families: the n_baskets count on an empty
    # fact table must not divide-by-zero, the regex scans must pass
    # empties through
    "brand_basket_rules",
    "html_extract_docs",
    "canonical_urls",
    "doc_encoding_readability",
    "sentence_chunks",
    # round-9 additions: the seeded/weighted graph twins (empty seeds,
    # empty weight totals), the MVCC centroid maintainer (0 seed
    # centroids), the broadcast-benchmark decontaminator, the
    # corpus-total LM anchor, the min/max bounds anchor, and both
    # packers — all must emit 0 rows, not crash
    "ppr_copurchase",
    "ppr_copurchase_fast",
    "wpagerank_copurchase",
    "wpagerank_copurchase_fast",
    "hits_copurchase_fast",
    "stream_centroid_refit",
    # semantic_decontaminate deliberately NOT pinned: an empty
    # benchmark split now raises (ADVICE r9 — the gate must not pass
    # every train row with zero coverage); its loud-raise contract has
    # its own pin below, the pq_adc_topk pattern.
    "unigram_logprob_quality",
    "lineitem_zorder_keys",
    "pack_sequences_ffd",
    # round-10 additions: the waterfill must yield an empty plan (not a
    # null-budget crash), CDC chunking an empty chunk table
    "mixture_waterfill",
    "cdc_chunk_docs",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in ALL_TESTDATA_TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    return d


def test_pinned_queries_survive_empty_tables(spark, empty_sf):
    queries = all_spark_queries()
    failures = {}
    for name in PINNED:
        try:
            queries[name](spark, empty_sf).count()
        except Exception as e:  # noqa: BLE001 — we report them all at once
            failures[name] = f"{type(e).__name__}: {e}"
    assert not failures, failures


def test_semantic_decontaminate_empty_bench_fails_loudly(spark, empty_sf):
    """An empty benchmark split makes the decontamination gate
    meaningless (it would pass every train row with zero coverage) —
    the contract is an explicit ValueError, not a silent empty pass."""
    queries = all_spark_queries()
    with pytest.raises(ValueError, match="benchmark split is empty"):
        queries["semantic_decontaminate"](spark, empty_sf).count()


def test_pq_seeding_fails_loudly_not_cryptically(spark, empty_sf):
    """pq_adc_topk genuinely cannot seed a codebook from nothing — the
    contract is an explicit ValueError, not a downstream crash."""
    queries = all_spark_queries()
    with pytest.raises(ValueError, match="at least 16 vectors"):
        queries["pq_adc_topk"](spark, empty_sf).count()


def test_metric_correlations_single_row_yields_null_not_crash(spark, tmp_path):
    """n=1 makes every variance zero: correlation is undefined — the
    query must return NULLs, not DIVIDE_BY_ZERO."""
    from commerce_sessionization_spark.schemas import ALL_TESTDATA_TABLES

    d = str(tmp_path / "one")
    for t in ALL_TESTDATA_TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    rows = all_spark_queries()["metric_correlations"](spark, d).collect()
    # exact-zero denominators (pure-decimal sufficient stats) are NULL;
    # pairs whose ss term mixes a double multiply can carry float dust
    # that defeats the exact-zero check — for those the contract is
    # "finite value, no exception", matched by the oracle's NULLIF path
    assert rows
    assert any(r.corr_q6 is None for r in rows)
