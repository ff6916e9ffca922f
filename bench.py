"""Benchmark harness — times the headline catalog queries.

Runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE
COMPACT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"sf": ..., "repeats": ..., "load_avg": ..., "n_queries": ...,
"prev_set_total": ...} — the last two (round-11) keep round-over-round
totals comparable when the headline set grows: prev_set_total is THIS
run's total over the previous round's benched set (names pinned in
bench_prev_set.json). The full payload — the
per-query timings dict and the per-query spread noise floor — is written
to ``bench_result.json`` beside this file. stdout stays compact because
the driver captures only a bounded TAIL of it: rounds 6 and 7 embedded
the full 72-query timings dict in the line and the truncated head lost
the ``value`` field, making the artifact machine-unreadable.
``tests/test_bench_contract.py`` pins the line under 500 bytes.

Each query executes fully distributed via the noop sink (no driver-side
collect); a warmup pass on the smallest table absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from commerce_sessionization_spark.plans.queries import all_spark_queries  # noqa: E402
from commerce_sessionization_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: Headline set: the flagship sessionization chain plus one representative
#: per operator family (scan+agg, star join, window top-k, text, dedup,
#: LSH, ANN). Kept deliberately small so the per-round signal is stable.
HEADLINE = [
    "sessionize_events",
    "sessionize_events_bucketed",
    "session_stats",
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "order_gaps",
    "asof_purchase_last_view",
    "doc_stats",
    "exact_dedup_docs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "knn_cosine",
    "segment_dedup_docs",
    "cms_heavy_hitters",
    "histogram_quantile_sketch",
    # round-2 session additions (new operator families)
    "repetition_scores",
    "ngram_decontaminate",
    "hourly_rollup_merge",
    "market_share",
    # round-3: the PageRank arithmetic split — decimal oracle mode vs the
    # double-precision scale path, benched side by side on the
    # iteration-dominated co-purchase graph (~600k edges at sf0.1)
    "pagerank_copurchase",
    "pagerank_copurchase_fast",
    # round-3 surface additions (one representative per new family)
    "cdc_merge_apply",
    "session_pattern_match",
    "cohort_retention",
    "weighted_sample_docs",
    # round-3 continued: training-data prep + compressed ANN + graph
    "chunk_documents",
    "pack_sequences",
    "pq_adc_topk",
    "triangle_counts",
    # second-session round-3 families: search ranking, substring-level
    # dedup, privacy release, deterministic augmentation
    "bm25_search",
    "duplicated_spans",
    "k_anonymized_customers",
    "augmented_docs",
    "revenue_cusum_alarms",
    # round-4 families: time-series resampling, iterative peeling,
    # semantic dedup, warehouse PIT join, mixing, model inference,
    # tier-b smoothing
    "event_gapfill_interp",
    "event_ohlc_daily",
    "kcore_parts",
    "semdedup_prune",
    "pit_scd2_join",
    "domain_mixture_sample",
    "quality_classifier_scores",
    "ses_daily_revenue",
    "phrase_search",
    "sliding_kmv_users",
    "conversion_funnel_24h",
    "customer_snapshot_diff",
    # round-4 continued: overlapping windows, community detection, BFS,
    # int8 quantized ANN, one-scan profiling, scalable global ranking
    "hopping_window_stats",
    "lpa_communities",
    "part_hop_distances",
    "sq_topk",
    "orders_profile",
    "doc_global_rank",
    # round-4 late: ACF, bloom-pruned join, sample quantiles, integrity
    # checksums, Holt trend, weighted SSSP
    "revenue_autocorrelation",
    "bloom_pruned_order_revenue",
    "sampled_value_quantiles",
    "table_checksums",
    "holt_daily_revenue",
    "part_weighted_distances",
    # round-5: price the exact multi-distinct Expand vs HLL++ side by
    # side (orders_profile already above; this is its 100 TB switch)
    "orders_profile_approx",
    # round-5 late: web-crawl HTML extraction (regex-heavy codegen scan)
    # and A-Priori basket rules (support-pruned within-basket explode)
    "html_extract_docs",
    "brand_basket_rules",
    # round-5 crawl family: per-block boilerplate classification, the
    # heaviest regex shape in the catalog
    "boilerplate_extract_docs",
    # round-6: the rewritten zero-shuffle robots decision, the two
    # quality-gate families newly in the graded window, the web-graph
    # edge builder, and the new DSIR data-selection family
    "robots_filtered_urls",
    "gopher_doc_flags",
    "c4_filtered_docs",
    "doc_outlinks",
    "dsir_weights",
    # round-7: the composed corpus pipeline with DSIR selection, the
    # crawl loop-closer, per-doc drop attribution, entity resolution
    "llm_corpus_dsir_pipeline",
    "crawl_frontier",
    "corpus_drop_reasons",
    "customer_entity_resolution",
    # round-8: the two streaming maintainers graded by value (the MVCC
    # disk drives ARE the measured path), hybrid lexical fusion, and
    # sitemap ingestion
    "stream_ingest_dedup",
    "dsir_stream_stats",
    "hybrid_search_rrf",
    "sitemap_urls",
    # round-8 continued: substring-level training-data dedup (ExactSubstr)
    "exact_substring_dedup",
    "corpus_shard_manifest",
    "events_key_skew",
    # round-8 second session: exact set-similarity via prefix filtering,
    # the one-pass PCA stats family (+ its streaming maintainer drive),
    # MMR diversified rerank, personalized PageRank
    "prefix_jaccard_pairs",
    "embedding_covariance",
    "label_centroids",
    "stream_vector_stats",
    "mmr_diverse_topk",
    "ppr_copurchase",
    "hard_negatives",
    "orders_drift_psi",
    "substring_decontaminate",
    "wpagerank_copurchase",
    # round-9: the double-precision scale twins bench against their
    # decimal oracle modes (the pagerank_copurchase pair pattern), and
    # the streaming ANN-index maintainer joins the maintainer family
    "ppr_copurchase_fast",
    "wpagerank_copurchase_fast",
    "hits_copurchase_fast",
    "stream_centroid_refit",
    # round-10: the batched-IVF one-plan path, the composed compressed-
    # retrieval chain, the exact/double MMR twin pair (mmr_diverse_topk
    # above is now the integer-lattice exact mode; the double path
    # benches beside it), the streaming PSI maintainer, and the rest of
    # the round's graded additions
    "ivf_batch_topk",
    "compressed_retrieval_pipeline",
    "mmr_diverse_topk_fast",
    "stream_drift_psi",
    "semantic_decontaminate",
    "unigram_logprob_quality",
    "lineitem_zorder_keys",
    "blocking_key_audit",
    "pack_sequences_ffd",
    "mixture_waterfill",
    "cdc_chunk_docs",
    "leakage_safe_split",
    "mixture_sample_plan",
]

#: Per-query repeat count; the reported figure is the median, so one-off
#: JIT/codegen warmup (first run) and stray GC pauses don't skew the
#: round-over-round regression signal. Five timed runs (plus a discarded
#: compile run) keep the median stable enough that the reported spread —
#: (max-min)/median per query — is a usable noise floor for the
#: regression gate in tools/compare_bench.py. Override with
#: SPARK_GRAFT_REPEATS.
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "5"))


def compact_line(full: dict) -> str:
    """The one stdout line the driver machine-reads.

    Strips every unbounded field (``queries``, ``spread``) so the line
    stays well under the driver's stdout-tail capture window no matter
    how many headline queries the round adds. The full payload lives in
    ``bench_result.json``; this line carries only bounded scalars.
    """
    keep = (
        "metric", "value", "unit", "sf", "repeats", "load_avg",
        "load_warning", "n_queries", "prev_set_total",
    )
    return json.dumps({k: full[k] for k in keep if k in full})


def sf_label(path: str) -> float:
    name = os.path.basename(path.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    # sample BEFORE any work: the figure distinguishes a contended box
    # from an idle one — at completion it would measure the bench itself
    load_avg = round(os.getloadavg()[0], 2)
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_spark_queries()

    # warmup: spin up executors + codegen paths on the tiniest table
    queries["event_type_stats"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        runs = []
        # REPEATS+1 runs, first discarded: each query's first execution
        # pays its own whole-stage-codegen compile (a 128-agg plan costs
        # seconds to compile, ~0 to re-run), which is a per-plan constant,
        # not a per-data cost — the steady-state median is the signal a
        # long-running cluster job actually sees.
        for i in range(REPEATS + 1):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            if i > 0:
                runs.append(time.perf_counter() - t0)
        med = statistics.median(runs)
        timings[name] = round(med, 3)
        # relative run-to-run dispersion: the noise floor a regression
        # must clear before it counts as a plan change, not contention
        spreads[name] = round((max(runs) - min(runs)) / max(med, 1e-9), 3)

    full = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "repeats": REPEATS,
        "sf": sf_label(SF_DIR),
        # 1-min load average at bench START (pre-warmup): distinguishes
        # a real plan regression from a contended box across rounds
        "load_avg": load_avg,
        # bounded scalars for the driver's round-over-round comparison
        # (round-11): `value` is incomparable across rounds whenever the
        # headline set grows, which made round-10's ~5% improvement read
        # as a 6% regression. n_queries sizes the set; prev_set_total is
        # THIS run's total restricted to the PREVIOUS round's benched
        # set (names pinned in the committed bench_prev_set.json), i.e.
        # a like-for-like total against the previous round's artifact.
        "n_queries": len(timings),
    }
    prev_file = Path(__file__).resolve().parent / "bench_prev_set.json"
    if prev_file.exists():
        prev_names = set(json.loads(prev_file.read_text())["queries"])
        full["prev_set_total"] = round(
            sum(t for n, t in timings.items() if n in prev_names), 3
        )
    # Load honesty (round-8 VERDICT item 5): the r8 official artifact
    # ran at load 5.48 and read +14% vs the idle canonical number. A
    # loaded box can't be refused from in here (the driver owns the
    # schedule), but it CAN be made self-disqualifying: the compact
    # line carries load_warning=true whenever the pre-bench 1-min load
    # exceeds 1.0, so round-over-round comparisons skip flagged runs.
    if load_avg > 1.0:
        full["load_warning"] = True
    # Full payload (per-query timings + spread — the regression gate's
    # noise floor) goes to a FILE; stdout carries exactly ONE compact
    # line. Rounds 6 AND 7 shipped unparseable BENCH artifacts because
    # the timings/spread dicts pushed the line past the driver's
    # stdout-tail window and the truncated head lost `value`.
    # tools/compare_bench.py reads per-query detail from
    # bench_result.json / committed previews.
    here = Path(__file__).resolve().parent
    here.joinpath("bench_result.json").write_text(json.dumps(full) + "\n")
    # the driver benches twice (main + low-core) and the second run
    # overwrites bench_result.json — a per-core-count copy preserves
    # BOTH runs' per-query timings so per-query scaling is inspectable
    # after the fact (round-11; VERDICT r10 noted scaling.per_query is
    # permanently empty from stdout alone)
    here.joinpath(f"bench_result_c{CPUS}.json").write_text(
        json.dumps(full) + "\n"
    )
    print(compact_line(full))
    spark.stop()


if __name__ == "__main__":
    main()
