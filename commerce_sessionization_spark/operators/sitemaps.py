"""Sitemap ingestion (sitemaps.org XML) — the crawl family's third
discovery channel next to page outlinks and robots.txt.

A crawler learns URLs three ways: links on fetched pages
(``extract_links``), the robots surface (``parse_robots_df`` — which
also NAMES sitemaps via the ``Sitemap:`` directive), and the sitemaps
themselves. This module parses the two sitemaps.org document kinds:

- ``<urlset>`` — leaf sitemaps: ``<url><loc>…</loc><lastmod>…</lastmod>``
  entries (lastmod/changefreq/priority optional);
- ``<sitemapindex>`` — index files pointing at more sitemaps:
  ``<sitemap><loc>…</loc></sitemap>`` entries.

Parsing is anchored-regex over the XML (RE2-safe patterns, no
backtracking hazard): sitemaps.org fixes the element vocabulary, and
real-world sitemap XML is machine-generated — the same trade
``extract_links`` makes for HTML. Entity-decoding covers the five XML
built-ins (``&amp; &lt; &gt; &quot; &apos;``), which the spec requires
escaped in ``<loc>``. Everything is built-in expressions
(``regexp_extract_all`` / ``transform`` / explode) — JVM-side, no
Python in the hot path, and replayable in DuckDB for the oracle.

100 TB shape: one narrow pass over the sitemap bodies; per-row fan-out
is the entry count of that sitemap (spec caps a sitemap at 50k URLs),
and the output feeds ``crawl_frontier``'s candidate side, whose
politeness cap already bounds any single host's contribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: one <url>…</url> or <sitemap>…</sitemap> block; non-greedy body
_URL_BLOCK = r"<url\b[^>]*>(?s:.)*?</url>"
_SITEMAP_BLOCK = r"<sitemap\b[^>]*>(?s:.)*?</sitemap>"
_LOC = r"<loc\s*>\s*((?s:.)*?)\s*</loc>"
_LASTMOD = r"<lastmod\s*>\s*((?s:.)*?)\s*</lastmod>"


def _xml_unescape(col: F.Column) -> F.Column:
    """The five XML built-in entities, &amp; last so it can't create
    new entity spellings out of the others' replacements."""
    out = col
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def parse_sitemaps(
    bodies: DataFrame,
    body_col: str = "content",
    source_col: str = "sitemap_url",
) -> DataFrame:
    """Sitemap XML bodies → one row per entry.

    Output: (``source_col``, kind, loc, lastmod) where kind is ``'url'``
    for ``<urlset>`` entries and ``'sitemap'`` for ``<sitemapindex>``
    entries (feed those back through a fetch + this parser to walk an
    index), loc is the entity-decoded target, and lastmod is the raw
    ``<lastmod>`` string or NULL. Rows whose block has no ``<loc>`` are
    dropped (the only required element).
    """
    body = F.col(body_col)
    blocks = F.concat(
        F.transform(
            F.regexp_extract_all(body, F.lit(_URL_BLOCK), F.lit(0)),
            lambda b: F.struct(F.lit("url").alias("kind"), b.alias("b")),
        ),
        F.transform(
            F.regexp_extract_all(body, F.lit(_SITEMAP_BLOCK), F.lit(0)),
            lambda b: F.struct(F.lit("sitemap").alias("kind"), b.alias("b")),
        ),
    )
    rows = bodies.select(
        F.col(source_col), F.explode(blocks).alias("_e")
    ).select(
        source_col,
        F.col("_e.kind").alias("kind"),
        F.regexp_extract(F.col("_e.b"), _LOC, 1).alias("_loc"),
        F.regexp_extract(F.col("_e.b"), _LASTMOD, 1).alias("_lastmod"),
    )
    return rows.filter(F.col("_loc") != "").select(
        source_col,
        "kind",
        _xml_unescape(F.col("_loc")).alias("loc"),
        F.when(F.col("_lastmod") != "", F.col("_lastmod")).alias("lastmod"),
    )


def sitemap_frontier_candidates(
    sitemap_rows: DataFrame, source_col: str = "sitemap_url"
) -> DataFrame:
    """Leaf-sitemap entries shaped as ``crawl_frontier`` outlink rows:
    the sitemap acts as the referring page (src) of each listed URL
    (dst), so sitemap-announced URLs enter the frontier's in-degree
    scoring and per-host politeness cap exactly like organic links —
    union these with ``extract_links`` output and call
    ``crawl_frontier`` once.
    """
    return sitemap_rows.filter(F.col("kind") == "url").select(
        F.col(source_col).alias("src"), F.col("loc").alias("dst")
    )
