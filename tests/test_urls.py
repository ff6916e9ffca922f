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
