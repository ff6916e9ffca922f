"""Propose the next driver-window rotation from CORRECTNESS history.

The driver grades the first 50 catalog entries (``CATALOG``) each round;
everything else lives in ``EXTENDED_CATALOG``, oracle-checked locally
but invisible to the driver's gate. To burn down cumulative coverage
(every catalog query driver-graded at least once), the window is
composed as:

    SENTINELS                 ~36 always-on queries — the SURVEY §2
                              reference-parity core plus exactly one
                              representative per operator family that
                              must never fall out of the graded window
                              (mirrors REQUIRED_IN_DRIVER_WINDOW's
                              intent in tests/test_catalog.py)
    rotating slots (50 - len) filled by ascending driver grade-count,
                              ties broken by PRIORITY (the families the
                              last VERDICT asked to rotate in), then by
                              catalog order

Usage:
    python tools/gen_rotation.py             # print proposed window
    python tools/gen_rotation.py --counts    # per-query grade counts

``grade_counts()`` is also imported by tools/gen_catalog_md.py so
CATALOG.md shows how many rounds each query has been driver-graded.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

#: Always-on window members: reference-parity core + one per family.
SENTINELS = [
    # reference parity (SURVEY §2.2-2.7 core)
    "sessionize_events",
    "prev_active_sessions",
    "user_event_sequence",
    # crawl / ingest IO
    "warc_roundtrip_checksums",
    "html_extract_docs",
    "robots_filtered_urls",
    # profiling / DQ
    "orders_profile",
    # joins
    "asof_purchase_last_view",
    "order_lineitem_range_join",
    "pit_scd2_join",
    "cdc_merge_apply",
    # TPC-H strategy suite
    "pricing_summary",
    "revenue_by_nation",
    "market_share",
    "order_cube",
    # commerce analytics
    "conversion_funnel_24h",
    "brand_basket_rules",
    # text quality / tokens
    "gopher_doc_flags",
    "c4_filtered_docs",
    "language_id",
    "tf_idf",
    "pii_scrub",
    # chunking / packing
    "sentence_chunks",
    "pack_sequences",
    # dedup tiers
    "stream_ingest_dedup",
    "exact_substring_dedup",
    # privacy
    "k_anonymized_customers",
    # similarity / ANN
    "pq_adc_topk",
    # graph
    "part_hop_distances",
    "triangle_counts",
    # sketches / sampling / time series
    "cms_heavy_hitters",
    "domain_temperature_sample",
    "event_gapfill_interp",
    # search ranking
    "hybrid_search_rrf",
    # composed pipeline + entity resolution
    "llm_corpus_dsir_pipeline",
    "customer_entity_resolution",
]

#: Tie-break queue among equal grade-counts: the never-graded families
#: queued for the NEXT rotation. (Round 9 rotated the 13 round-8
#: families + stream_crawl_frontier into the window — once
#: CORRECTNESS_r09 lands they carry grade-count 1 and leave the
#: rotating pool automatically.) Round-10 queue: the round-9 additions
#: plus the two batch/stream twins whose graded siblings entered in r9.
PRIORITY = [
    # round-10 queue (r9 verdict item 4; stream_centroid_refit and
    # semantic_decontaminate graded green in r9 and left the queue)
    "stream_drift_psi",        # streaming PSI maintainer (batch twin graded r9)
    "ivf_batch_topk",          # batched IVF == brute force identity
    "unigram_logprob_quality",  # CCNet unigram-LM quality proxy (new r9)
    "lineitem_zorder_keys",    # z-order key math (new r9, local-graded)
    "blocking_key_audit",      # ER pre-flight bound (new r10, verdict item 6)
    "compressed_retrieval_pipeline",  # composed SQ+IVF+MMR chain (new r10)
    # round-11 queue (these entered the r10 window above; next up)
    "mixture_waterfill",       # token-budget feasibility solve (new r10)
    "cdc_chunk_docs",          # content-defined-chunking dedup (new r10)
    "leakage_safe_split",      # near-dup-safe train/test split (new r10)
    "mixture_sample_plan",     # waterfill plan executed as a sampler (r10)
]

WINDOW_SIZE = 50


def grade_counts(repo: Path = REPO) -> dict[str, dict[str, int]]:
    """Per-query driver history: rounds graded and rounds fully green."""
    out: dict[str, dict[str, int]] = defaultdict(
        lambda: {"graded": 0, "green": 0}
    )
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        data = json.loads(f.read_text())
        for name, r in data.items():
            out[name]["graded"] += 1
            # green = FULLY green: rows AND schema AND value hash all
            # passed (hash/schema absent on rows-only records counts as
            # pass; an explicit False never does — r04's orders_profile
            # was rows_match=True / hash_match=False and must not read
            # as a green round)
            if (
                r.get("err") is None
                and r.get("rows_match")
                and r.get("schema_match") is not False
                and r.get("hash_match") is not False
            ):
                out[name]["green"] += 1
    return dict(out)


def propose_window(window_size: int = WINDOW_SIZE) -> list[str]:
    from commerce_sessionization_spark.plans.queries import FULL_CATALOG

    names = [q.name for q in FULL_CATALOG]
    order = {n: i for i, n in enumerate(names)}
    missing = [s for s in SENTINELS if s not in order]
    if missing:
        raise SystemExit(f"sentinels not in catalog: {missing}")
    # rows-only queries can never grade green (the driver marks an
    # oracle-less window row `err: no_oracle` — round 9's permanent red
    # slot); the window contract in tests/test_catalog.py forbids them,
    # so they never enter the rotating pool.
    sql_oracled = {q.name for q in FULL_CATALOG if q.oracle is not None}
    counts = grade_counts()
    prio = {n: i for i, n in enumerate(PRIORITY)}
    rotating = sorted(
        (n for n in names if n not in SENTINELS and n in sql_oracled),
        key=lambda n: (
            counts.get(n, {}).get("graded", 0),
            prio.get(n, len(PRIORITY)),
            order[n],
        ),
    )
    return SENTINELS + rotating[: window_size - len(SENTINELS)]


def main() -> None:
    if "--counts" in sys.argv:
        counts = grade_counts()
        from commerce_sessionization_spark.plans.queries import FULL_CATALOG

        for q in FULL_CATALOG:
            c = counts.get(q.name, {"graded": 0, "green": 0})
            print(f"{q.name}\t{c['graded']}\t{c['green']}")
        return
    window = propose_window()
    from commerce_sessionization_spark.plans.queries import CATALOG

    current = {q.name for q in CATALOG}
    print(f"# proposed {len(window)}-query window "
          f"({len(SENTINELS)} sentinels + {len(window) - len(SENTINELS)} "
          "rotating)")
    for n in window:
        tag = "" if n in current else "  << rotate IN"
        print(f"{n}{tag}")
    out = [n for n in sorted(current) if n not in set(window)]
    print(f"\n# rotate OUT ({len(out)}):")
    for n in out:
        print(n)


if __name__ == "__main__":
    main()
