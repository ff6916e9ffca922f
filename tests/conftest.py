from __future__ import annotations

import pytest

from commerce_sessionization_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield s
    s.stop()


# ---------------------------------------------------------------------------
# Fast/slow tiering (round 11, VERDICT r10 item 7). The nodeids below were
# measured >= 10 s each by the full-suite --durations=100 run (2 398 s total;
# these 54 carry 1 713 s of it). pytest.ini deselects them by default so the
# driver's bounded verify window sees a complete green run; the full suite is
# the builder gate: python -m pytest tests/ -q -m "".
SLOW_TESTS = frozenset(
    (
        "tests/test_ann_recall.py::test_recall_monotone_and_beats_random_pruning",
        "tests/test_catalog.py::test_driver_window_outputs_are_scalar_only",
        "tests/test_catalog.py::test_oracle_sql_types_have_no_hugeint",
        "tests/test_empty_inputs.py::test_pinned_queries_survive_empty_tables",
        "tests/test_pipeline.py::test_cli_corpus_shards",
        "tests/test_pipeline.py::test_cli_corpus_subcommand",
        "tests/test_pipeline.py::test_cli_crawl_frontier_composition",
        "tests/test_pipeline.py::test_cli_crawl_robots_composed",
        "tests/test_pipeline.py::test_cli_crawl_sitemaps_join_the_frontier",
        "tests/test_pipeline.py::test_cli_crawl_two_round_loop_via_fetched",
        "tests/test_pipeline.py::test_cli_drift_subcommand",
        "tests/test_pipeline.py::test_cli_media_features_near_dups_flag",
        "tests/test_pipeline.py::test_cli_media_features_subcommand",
        "tests/test_pipeline.py::test_cli_mixture_subcommand",
        "tests/test_pipeline.py::test_cli_pca_subcommand",
        "tests/test_pipeline.py::test_cli_profile_subcommand",
        "tests/test_pipeline.py::test_cli_query_subcommand",
        "tests/test_pipeline.py::test_cli_skew_subcommand",
        "tests/test_pipeline.py::test_cli_split_subcommand",
        "tests/test_pipeline.py::test_cli_sql_subcommand",
        "tests/test_plans.py::test_no_accidental_cartesian_joins",
        "tests/test_properties.py::test_prefix_jaccard_equals_exhaustive_for_every_corpus",
        "tests/test_rollup.py::test_rollup_stream_end_to_end",
        "tests/test_sessions_bucketed.py::test_hot_user_skew_task_duration_bounded",
        "tests/test_smooth_stream.py::test_holt_stream_matches_batch",
        "tests/test_smooth_stream.py::test_holt_stream_replay_is_idempotent",
        "tests/test_smooth_stream.py::test_replayed_observations_are_dropped",
        "tests/test_smooth_stream.py::test_stream_matches_batch",
        "tests/test_stream_centroids.py::test_epoch_replay_rewrites_identical_state",
        "tests/test_stream_centroids.py::test_maintained_state_equals_batch_m_step",
        "tests/test_stream_centroids.py::test_refit_centroids_are_a_valid_quantizer",
        "tests/test_stream_centroids.py::test_state_is_self_describing_about_its_grid",
        "tests/test_stream_centroids.py::test_streaming_refit_recovers_recall_after_distribution_shift",
        "tests/test_streaming.py::test_cli_stream_subcommand",
        "tests/test_streaming.py::test_enrich_stream_with_static_dim",
        "tests/test_streaming.py::test_epoch_writer_replay_is_idempotent",
        "tests/test_streaming.py::test_late_data_beyond_watermark_is_dropped",
        "tests/test_streaming.py::test_stateful_matches_batch",
        "tests/test_streaming.py::test_stateful_session_structure",
        "tests/test_streaming.py::test_stream_pipeline_crash_replay_no_duplicates",
        "tests/test_streaming.py::test_stream_pipeline_restart_resumes_exactly_once",
        "tests/test_streaming.py::test_stream_pipeline_writes_partitioned_sessions",
        "tests/test_streaming.py::test_stream_stream_purchase_attribution",
        "tests/test_streaming_contention.py::test_stale_lock_from_dead_holder_is_stolen",
        "tests/test_urls.py::test_url_skew_probe_hot_host_stays_balanced",
        "tests/test_warc.py::test_crawl_feeds_dedup_family",
        "tests/test_warc.py::test_crawl_links_pagerank_composition",
        "tests/test_warc.py::test_write_wet_roundtrip",
        "tests/test_waterfill.py::test_all_saturate_when_budget_covers_availability",
        "tests/test_waterfill.py::test_budget_conservation_and_caps",
        "tests/test_waterfill.py::test_matches_fraction_reference_on_seeded_cases",
        "tests/test_waterfill.py::test_sample_plan_delivers_the_allocation",
        "tests/test_waterfill.py::test_unsaturated_allocs_follow_target_proportion",
        "tests/test_waterfill.py::test_zero_weight_and_zero_availability_domains",
    )
)


def pytest_collection_modifyitems(config, items):
    matched = set()
    collected_files = set()
    slow_marker = pytest.mark.slow
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        collected_files.add(nodeid.split("::", 1)[0])
        if nodeid in SLOW_TESTS:
            item.add_marker(slow_marker)
            matched.add(nodeid)
    # a renamed/removed test silently shrinking the slow list would bloat
    # the fast tier unnoticed — fail collection loudly instead. Only
    # entries whose FILE was collected count, so partial runs
    # (pytest tests/test_graph.py) stay usable.
    missing = {
        n
        for n in SLOW_TESTS - matched
        if n.split("::", 1)[0] in collected_files
    }
    if missing:
        raise pytest.UsageError(
            "SLOW_TESTS entries match no collected test: " + ", ".join(sorted(missing))
        )
