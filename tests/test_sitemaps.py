"""sitemaps.org parsing (operators/sitemaps.py) + frontier composition."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.crawl import crawl_frontier
from commerce_sessionization_spark.operators.sitemaps import (
    parse_sitemaps,
    sitemap_frontier_candidates,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://shop.example/p?a=1&amp;b=2</loc>
    <lastmod>2024-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>
      https://shop.example/about
  </loc></url>
  <url><priority>0.1</priority></url>
</urlset>
"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://shop.example/sitemap-2024.xml</loc>
    <lastmod>2024-02-01T09:00:00Z</lastmod>
  </sitemap>
  <sitemap><loc>https://shop.example/sitemap-2023.xml</loc></sitemap>
</sitemapindex>
"""


def _bodies(spark, rows):
    return spark.createDataFrame(
        [Row(sitemap_url=u, content=c) for u, c in rows]
    )


def test_urlset_entries_with_entities_whitespace_and_optional_fields(spark):
    out = parse_sitemaps(
        _bodies(spark, [("https://shop.example/sitemap.xml", URLSET)])
    ).orderBy("loc").collect()
    # the loc-less <url> block is dropped; entities decode; loc trims
    assert [(r.kind, r.loc, r.lastmod) for r in out] == [
        ("url", "https://shop.example/about", None),
        ("url", "https://shop.example/p?a=1&b=2", "2024-01-05"),
    ]


def test_sitemapindex_entries_surface_as_kind_sitemap(spark):
    out = parse_sitemaps(
        _bodies(spark, [("https://shop.example/sitemap.xml", INDEX)])
    ).orderBy("loc").collect()
    assert [(r.kind, r.loc, r.lastmod) for r in out] == [
        ("sitemap", "https://shop.example/sitemap-2023.xml", None),
        ("sitemap", "https://shop.example/sitemap-2024.xml",
         "2024-02-01T09:00:00Z"),
    ]


def test_mixed_document_parses_both_kinds(spark):
    out = parse_sitemaps(
        _bodies(spark, [
            ("https://a.example/s.xml", URLSET),
            ("https://b.example/s.xml", INDEX),
        ])
    )
    kinds = {r.kind for r in out.collect()}
    assert kinds == {"url", "sitemap"}
    assert out.count() == 4


def test_garbage_and_empty_bodies_yield_no_rows(spark):
    out = parse_sitemaps(_bodies(spark, [
        ("https://a.example/s.xml", "not xml at all <loc> dangling"),
        ("https://b.example/s.xml", ""),
        ("https://c.example/s.xml", "<urlset></urlset>"),
    ]))
    assert out.count() == 0


def test_sitemap_candidates_enter_frontier_scoring_and_cap(spark):
    """Sitemap-announced URLs ride the frontier like organic links: a
    URL both linked and sitemap-listed earns in-degree 2 and outranks
    the sitemap-only URL under a per-host cap."""
    organic = spark.createDataFrame([
        Row(src="https://seed.net/", dst="https://shop.example/p?a=1&b=2"),
    ])
    sm = parse_sitemaps(
        _bodies(spark, [("https://shop.example/sitemap.xml", URLSET)])
    )
    cand = organic.unionByName(sitemap_frontier_candidates(sm))
    fetched = spark.createDataFrame([Row(url="https://seed.net/")])
    top = crawl_frontier(cand, fetched, per_host_k=1).collect()
    assert len(top) == 1
    assert top[0].url == "https://shop.example/p?a=1&b=2"
    assert top[0].n_referrers == 2
    # without the cap, the sitemap-only URL is there too, ranked second
    both = crawl_frontier(cand, fetched, per_host_k=10).orderBy(
        F.desc("n_referrers")
    ).collect()
    assert [r.url for r in both] == [
        "https://shop.example/p?a=1&b=2", "https://shop.example/about",
    ]
    assert [r.rank for r in both] == [1, 2]


def test_sitemaps_from_robots_extracts_group_independent_directives(spark):
    from commerce_sessionization_spark.operators.robots import (
        sitemaps_from_robots,
    )

    body = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: https://shop.example/sitemap.xml\n"
        "\n"
        "User-agent: megabot\n"
        "Allow: /\n"
        "SITEMAP:https://shop.example/sitemap-2.xml\n"
        "  sitemap : https://shop.example/sitemap-3.xml  # trailing note\n"
        "# Sitemap: https://shop.example/commented-out.xml\n"
        "Sitemap: https://shop.example/sitemap.xml\n"  # duplicate
    )
    rows = sitemaps_from_robots(
        spark.createDataFrame([Row(host="shop.example", content=body)])
    ).orderBy("sitemap_url").collect()
    assert [(r.host, r.sitemap_url) for r in rows] == [
        ("shop.example", "https://shop.example/sitemap-2.xml"),
        ("shop.example", "https://shop.example/sitemap-3.xml"),
        ("shop.example", "https://shop.example/sitemap.xml"),
    ]


def test_sitemaps_from_robots_composes_with_parser(spark):
    """robots -> sitemap URLs -> (fetched) bodies -> frontier rows."""
    from commerce_sessionization_spark.operators.robots import (
        sitemaps_from_robots,
    )

    robots = spark.createDataFrame([
        Row(host="shop.example",
            content="Sitemap: https://shop.example/sitemap.xml\n"),
        Row(host="silent.example", content="User-agent: *\nDisallow:\n"),
    ])
    announced = sitemaps_from_robots(robots)
    assert [r.sitemap_url for r in announced.collect()] == [
        "https://shop.example/sitemap.xml"
    ]
    # "fetch" the announced document and parse it
    fetched = announced.join(
        _bodies(spark, [("https://shop.example/sitemap.xml", URLSET)]),
        "sitemap_url",
    )
    parsed = parse_sitemaps(fetched)
    assert parsed.count() == 2  # the two loc-bearing entries of URLSET
