"""Pins bench.py's stdout contract: ONE compact machine-parseable line.

The driver captures only a bounded tail of bench.py's stdout and parses
the final line as JSON. Rounds 6 and 7 both shipped `parsed: null`
BENCH artifacts because the line embedded the full per-query timings
dict, whose head (and the `value` field with it) fell outside the tail
window. These tests make that regression structurally impossible: the
compact line must stay under 500 bytes even with an adversarially large
per-query payload, and must carry the fields the driver grades on.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _fat_payload(n_queries: int = 500) -> dict:
    """A payload far larger than any real round's headline set."""
    return {
        "metric": "headline_queries_total",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"query_with_a_long_name_{i:04d}": 1.234 for i in range(n_queries)},
        "spread": {f"query_with_a_long_name_{i:04d}": 0.05 for i in range(n_queries)},
        "repeats": 5,
        "sf": 0.1,
        "load_avg": 0.42,
    }


def test_compact_line_stays_under_500_bytes():
    line = bench.compact_line(_fat_payload())
    assert len(line.encode()) < 500, (
        f"compact stdout line is {len(line.encode())} bytes; the driver's "
        "tail capture truncates long lines and loses the value field"
    )


def test_compact_line_is_single_line_valid_json_with_graded_fields():
    line = bench.compact_line(_fat_payload())
    assert "\n" not in line
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "sf"):
        assert key in parsed, f"driver-graded field {key!r} missing"
    assert parsed["value"] == 123.456
    # unbounded dicts must never ride the stdout line
    assert "queries" not in parsed
    assert "spread" not in parsed


def test_compact_line_tolerates_missing_optional_fields():
    # a stripped payload (e.g. an older committed preview) must not crash
    line = bench.compact_line({"metric": "m", "value": 1.0, "unit": "sec", "sf": 0.1})
    parsed = json.loads(line)
    assert parsed["value"] == 1.0


def test_comparison_scalars_ride_the_compact_line():
    """Round-11 (VERDICT r10 item 2): the single-total stdout line made
    round-over-round totals incomparable whenever the headline set grew.
    The bounded scalars n_queries / prev_set_total must survive into the
    line — and keep it under the 500-byte tail window."""
    fat = _fat_payload()
    fat["n_queries"] = 500
    fat["prev_set_total"] = 118.932
    parsed = json.loads(bench.compact_line(fat))
    assert parsed["n_queries"] == 500
    assert parsed["prev_set_total"] == 118.932
    assert len(bench.compact_line(fat).encode()) < 500


def test_prev_set_file_matches_catalog():
    """bench_prev_set.json (the like-for-like comparison set) must name
    only queries that exist in the current HEADLINE — a renamed/dropped
    query would silently shrink prev_set_total."""
    prev = json.loads(
        (Path(__file__).resolve().parent.parent / "bench_prev_set.json").read_text()
    )
    missing = [n for n in prev["queries"] if n not in bench.HEADLINE]
    assert not missing, f"prev-set names missing from HEADLINE: {missing}"


def test_headline_queries_all_exist_in_catalog():
    from commerce_sessionization_spark.plans.queries import all_spark_queries

    queries = all_spark_queries()
    missing = [name for name in bench.HEADLINE if name not in queries]
    assert not missing, f"HEADLINE names missing from catalog: {missing}"


def test_load_warning_rides_the_compact_line():
    """Round-9: a loaded driver box (r8 official bench ran at load 5.48)
    must self-disqualify — load_warning survives into the compact line
    whenever present, and is absent for idle runs."""
    fat = _fat_payload()
    fat["load_warning"] = True
    parsed = json.loads(bench.compact_line(fat))
    assert parsed["load_warning"] is True
    idle = json.loads(bench.compact_line(_fat_payload()))
    assert "load_warning" not in idle
    # still bounded
    assert len(bench.compact_line(fat).encode()) < 500


def test_load_warning_threshold_logic():
    """The main() gate: warning iff 1-min load > 1.0. Replicated here as
    the same expression main() applies so the threshold is pinned."""
    for load, expect in ((0.0, False), (0.99, False), (1.0, False),
                         (1.01, True), (5.48, True)):
        full = {"load_avg": load}
        if full["load_avg"] > 1.0:
            full["load_warning"] = True
        assert ("load_warning" in full) is expect, load
