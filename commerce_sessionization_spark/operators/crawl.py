"""Crawl-to-corpus: WARC records → a documents-shaped training table.

The end-to-end composition the rest of the repo's corpus surface
assumes as its input: ``sources.io.read_warc_dir`` rows in, one clean
text document per successful HTML response out — everything downstream
(dedup, quality, language-ID, chunking, decontamination) operates on
this table's shape.

Each step is an existing audited operator; this module only composes:

1. keep ``response`` records with HTTP 200 and an HTML content type,
2. decode payload bytes as UTF-8 (invalid sequences → U+FFFD, which
   ``encoding_quality`` downstream then scores — lossage is data),
3. ``strip_html`` + ``html_features`` (visible text, link density),
4. ``canonical_url`` as the stable document key (crawls see the same
   page under many URL spellings; the canonical form is the dedup key),
5. stable doc_id = xxhash64(canonical_url).

Zero Python in this module's own hot path — the only non-codegen stage
in the whole chain is the WARC record framing upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.text import (
    html_features,
    strip_html,
)
from commerce_sessionization_spark.operators.urls import canonical_url


def crawl_to_corpus(
    warc_records: DataFrame,
    min_text_chars: int = 1,
    max_link_density: float | None = None,
    boilerplate: bool = False,
) -> DataFrame:
    """WARC record rows → (doc_id, url, fetched_at, text, link_density,
    tag_count, n_chars). See module docstring for the rule pipeline.

    ``boilerplate=True`` swaps step 3's whole-page ``strip_html`` for
    the per-block classifier (``text.remove_boilerplate``): text is then
    only the content blocks — nav/footer/banner chrome is gone before
    dedup ever sees it. The page-level ``link_density``/``tag_count``
    signals stay computed on the full markup either way."""
    pages = warc_records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").startswith("text/html")
    ).select(
        canonical_url(F.col("target_uri")).alias("url"),
        F.col("warc_date").alias("fetched_at"),
        # NOT F.decode(..., 'UTF-8'): Spark 4's decode is STRICT and one
        # malformed page would kill the whole pass (fuzz-era find). The
        # binary->string cast wraps bytes unvalidated; make_valid_utf8
        # then substitutes U+FFFD, which encoding_quality downstream
        # scores — lossage is data, not an error.
        F.make_valid_utf8(F.col("payload").cast("string")).alias("html"),
    )
    out = html_features(pages, "html")
    if boilerplate:
        from commerce_sessionization_spark.operators.text import (
            remove_boilerplate,
        )

        out = remove_boilerplate(out, "html", "text").drop(
            "n_blocks_kept", "n_blocks_total"
        )
    else:
        out = strip_html(out, "html", "text")
    out = out.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        "fetched_at",
        "text",
        "link_density",
        "tag_count",
        F.length("text").cast("bigint").alias("n_chars"),
    ).filter(F.length("text") >= min_text_chars)
    if max_link_density is not None:
        out = out.filter(F.col("link_density") <= max_link_density)
    return out


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
) -> DataFrame:
    """Outlink edges from HTML — the web-graph builder.

    Extracts every ``href="..."`` / ``href='...'`` and resolves it
    against the page URL: absolute links pass through,
    ``//host/path`` inherits the scheme, ``/rooted`` paths replace the
    base path, fragments drop, and bare relative paths append to the
    base directory (``..`` segments are NOT collapsed — dot-segment
    normalization needs a loop; at corpus scale the un-collapsed form
    is still a consistent join key, and ``canonical_url`` downstream
    handles the rest). Output is one (src, dst) row per DISTINCT href
    (array_union dedupes — a nav repeated per page emits one edge);
    feed it straight to ``operators.graph.pagerank`` and friends.

    All column expressions (regexp_extract_all + explode + when-chain):
    the web graph falls out of the crawl table with zero Python.
    """
    base = F.col(base_col)
    scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    origin = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    # base directory: everything through the last '/' of the path
    basedir = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*://[^?#]*/)", 1)
    basedir = F.when(basedir == "", F.concat(origin, F.lit("/"))).otherwise(
        basedir
    )
    hrefs = F.array_union(
        F.regexp_extract_all(
            F.col(html_col), F.lit(r'(?i)href="([^"]*)"'), F.lit(1)
        ),
        F.regexp_extract_all(
            F.col(html_col), F.lit(r"(?i)href='([^']*)'"), F.lit(1)
        ),
    )
    out = df.select(
        F.col(base_col).alias("src"),
        scheme.alias("_scheme"),
        origin.alias("_origin"),
        basedir.alias("_basedir"),
        F.explode(hrefs).alias("href"),
    )
    href = F.col("href")
    resolved = (
        F.when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), href)
        .when(href.startswith("//"), F.concat(F.col("_scheme"), F.lit(":"), href))
        .when(href.startswith("/"), F.concat(F.col("_origin"), href))
        .when(href.startswith("#") | (href == ""), F.lit(None))
        .otherwise(F.concat(F.col("_basedir"), href))
    )
    return (
        out.withColumn("dst", resolved)
        .filter(F.col("dst").isNotNull())
        .select("src", "href", "dst")
    )


def crawl_frontier(
    outlinks: DataFrame,
    fetched: DataFrame,
    per_host_k: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    url_col: str = "url",
) -> DataFrame:
    """Next fetch batch from the web graph — the loop-closer of the
    crawl family (crawl → extract_links → frontier → fetch).

    Discovered targets are canonicalized, already-fetched URLs drop
    (anti-join — bucket the fetched index by url at corpus scale, cf.
    ``incremental_exact_dedup``), each survivor is scored by in-degree
    (count of DISTINCT referring pages — the standard crawl priority),
    and a politeness cap keeps only the top ``per_host_k`` per host so
    one fetch round hits no host more than k times. Non-http(s)
    schemes drop. Deterministic total order (score desc, url asc), so
    the frontier is engine-replayable.

    Skew is the scale hazard: ONE hot host (a link farm, a big CDN)
    can own most of the candidate set, and a naive per-host window
    would funnel it through one task. The plain ``row_number() <= k``
    formulation is nevertheless the right plan on Spark ≥ 3.5: the
    optimizer inserts a PARTIAL ``WindowGroupLimit`` before the
    exchange, so every map task pre-prunes its slice to k rows per
    host and the host-partitioned shuffle moves at most
    map_tasks × k rows per host — the hot host never concentrates.
    Plan-asserted in tests/test_plans.py; measured under a 99:1 host
    skew in tools/frontier_skew_probe.py (byte-uniform tasks, vs a
    ~15× hot task with the rule excluded). An earlier hand-rolled
    two-stage salted rank produced identical rows while paying one
    extra exchange — the optimizer already owns this one.

    Output: (url, host, n_referrers, rank), rank 1..k per host.
    """
    from pyspark.sql import Window

    from commerce_sessionization_spark.operators.urls import url_parts

    cand = outlinks.select(
        canonical_url(F.col(dst_col)).alias("url"),
        canonical_url(F.col(src_col)).alias("_ref"),
    )
    scores = cand.groupBy("url").agg(
        F.count_distinct("_ref").alias("n_referrers")
    )
    seen = fetched.select(
        canonical_url(F.col(url_col)).alias("url")
    ).distinct()
    fresh = scores.join(seen, "url", "left_anti")
    parts = url_parts(F.col("url"))
    fresh = fresh.withColumn("host", parts["host"]).filter(
        parts["scheme"].isin("http", "https")
    )
    top = Window.partitionBy("host").orderBy(
        F.desc("n_referrers"), F.asc("url")
    )
    return (
        fresh.withColumn("rank", F.row_number().over(top))
        .filter(F.col("rank") <= per_host_k)
        .select("url", "host", "n_referrers", "rank")
    )
