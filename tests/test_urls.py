"""URL canonicalization: every rule pinned on crafted URLs, idempotence,
the dedup operator, and the JVM-side plan guarantee.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.urls import (
    canonical_url,
    dedup_by_canonical_url,
    url_parts,
)


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], ["id", "url"]
    )
    rows = df.withColumn("c", canonical_url(F.col("url"))).collect()
    return [r["c"] for r in sorted(rows, key=lambda r: r["id"])]


def test_case_port_fragment_tracking_sort_slash(spark):
    out = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/Doc/Page/?b=2&utm_source=x&a=1#f",
            "https://www.example.com/Doc/Page?a=1&b=2",
            "http://example.com:80/",
            "http://example.com",
            "https://example.com/p?utm_campaign=s&gclid=abc",
            "https://example.com/p?",
            "ftp://Host.Net:21/File",
            "relative/path?x=1",
        ],
    )
    assert out[0] == "https://www.example.com/Doc/Page?a=1&b=2"
    assert out[0] == out[1]  # five spellings, one canonical form
    assert out[2] == out[3] == "http://example.com/"
    assert out[4] == out[5] == "https://example.com/p"
    assert out[6] == "ftp://host.net:21/File"  # non-default port kept
    assert out[7] == "relative/path?x=1"  # not absolute: untouched


def test_path_and_query_case_preserved(spark):
    # only scheme+host fold; /CaseSensitive and ?Key=Value must survive
    (out,) = _canon(spark, ["HTTP://A.COM/CaseSensitive?Key=Value"])
    assert out == "http://a.com/CaseSensitive?Key=Value"


def test_canonicalization_is_idempotent(spark):
    urls = [
        "HTTPS://WWW.Example.COM:443/Doc/?b=2&utm_source=x&a=1#f",
        "http://example.com:80",
        "https://example.com/p?z=1&y=2&x=3",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice


def test_bare_tracking_param_without_value_removed(spark):
    (out,) = _canon(spark, ["https://a.com/p?ref&x=1"])
    assert out == "https://a.com/p?x=1"


def test_url_parts_domain_heuristic(spark):
    df = spark.createDataFrame(
        [(1, "https://news.sub.example.co/path/x?q=1#f")], ["id", "url"]
    )
    parts = url_parts(F.col("url"))
    r = df.select(
        *[v.alias(k) for k, v in parts.items()]
    ).first()
    assert r["scheme"] == "https"
    assert r["host"] == "news.sub.example.co"
    assert r["domain"] == "example.co"  # last two labels
    assert r["path"] == "/path/x"
    assert r["query"] == "q=1"


def test_dedup_by_canonical_url(spark):
    df = spark.createDataFrame(
        [
            (1, "HTTPS://A.COM/x?b=2&a=1", 10),
            (2, "https://a.com/x?a=1&b=2#frag", 20),
            (3, "https://a.com/other", 30),
        ],
        ["id", "url", "ts"],
    )
    kept = dedup_by_canonical_url(df, "url", tie_col="ts").collect()
    assert {r["id"] for r in kept} == {1, 3}  # earliest ts wins the dup


def test_urls_stay_jvm_side(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")], ["id", "url"])
    plan = (
        df.select(canonical_url(F.col("url")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_skew_probe_hot_host_stays_balanced():
    """dedup_by_canonical_url shuffles on the canonical URL; the plan's
    scale assumption is that HOST skew (one domain owning ~99% of
    pages) does not become SHUFFLE-KEY skew, because URLs are unique
    within the hot host. Ground truth via tools/url_skew_probe.py: the
    reduce stage's shuffle-read BYTES must stay uniform (max/median
    ~1.0; asserted < 1.5 — a true hot key would put ~99% of bytes in
    one task, ratio ~16 at 16 partitions). Bytes, not task millis:
    sub-200ms task durations are scheduler noise on a loaded box."""
    import json as _json
    import subprocess
    import sys as _sys
    from pathlib import Path as _Path

    probe = (
        _Path(__file__).resolve().parent.parent / "tools" / "url_skew_probe.py"
    )
    out = subprocess.run(
        [_sys.executable, str(probe), "400000", "0.99", "4"],
        capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = _json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["reduce_stage_tasks"] > 1, stats
    assert stats["max_over_median_bytes"] is not None, stats
    assert stats["max_over_median_bytes"] < 1.5, stats
    # dedup really ran: the planted 2% duplicate band collapsed
    assert stats["rows_out"] < stats["rows"], stats
