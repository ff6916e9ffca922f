"""URL canonicalization — the dedup key for crawled pages.

A crawl sees the same page under many spellings: scheme/host case,
explicit default ports, tracking parameters, shuffled query order,
fragments, trailing slashes. Deduplicating on the raw string misses all
of them; canonicalizing first is the standard step (every crawler —
Nutch, Heritrix, CommonCrawl's URL index — ships a variant of exactly
these rules). Reference parity note: the reference repo has no URL
surface; this belongs to the training-data-pipeline north star.

Everything here is built-in column expressions (regexp, split,
array_sort, filter, concat_ws) — zero Python in the hot path, zero
shuffles, and a DuckDB oracle can replay every rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that never change page content — analytics payload.
TRACKING_PARAM_PATTERN = r"^(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid|ref)="


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL column, applied as a fixed rule pipeline:

    1. lowercase the scheme and host (path/query stay case-sensitive),
    2. drop the ``#fragment``,
    3. drop explicit default ports (``:80`` for http, ``:443`` for https),
    4. remove tracking query params (``utm_*``, ``gclid``, ...),
    5. sort surviving query params byte-wise (order never matters
       server-side; sorting makes equal queries equal strings),
    6. drop an empty ``?`` and a trailing ``/`` on a non-root path.

    Each rule is idempotent and the pipeline is order-sensitive only
    where the spec demands (fragment before query parsing).
    """
    u = url
    # 1. scheme+host lowercase: split at the first '/' after '://'
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    # 2. fragment already excluded by the rest-capture ([^#]*)
    # 3. default ports
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.when(
        rest.contains("?"), F.regexp_extract(rest, r"\?(.*)$", 1)
    ).otherwise(F.lit(""))
    # 4+5. filter tracking params, sort the rest
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & ~p.rlike(TRACKING_PARAM_PATTERN)
        & ~p.rlike(TRACKING_PARAM_PATTERN.rstrip("=") + "$"),
    )
    query_norm = F.array_join(F.array_sort(params), "&")
    # 6. trailing slashes on non-root paths (ALL of them — stripping one
    # per pass broke idempotence on "///", caught by the hypothesis
    # property); empty result -> "/"
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(
        scheme == "", u  # not an absolute URL: leave untouched
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            hostport,
            path,
            F.when(query_norm != "", F.concat(F.lit("?"), query_norm)).otherwise(
                F.lit("")
            ),
        )
    )


def url_parts(url: Column) -> dict[str, Column]:
    """Scheme/host/registered-ish domain/path/query columns from a URL.

    ``domain`` is the last two host labels — a heuristic, not a public
    suffix list (which is data, not logic; plug one in via a broadcast
    join when exactness matters). Everything stays JVM-side.
    """
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1)
    )
    labels = F.split(host, r"\.")
    n = F.size(labels)
    domain = F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(host)
    return {
        "scheme": F.lower(
            F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
        ),
        "host": host,
        "domain": domain,
        "path": F.regexp_extract(
            url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
        ),
        "query": F.regexp_extract(url, r"\?([^#]*)", 1),
    }


def dedup_by_canonical_url(
    df: DataFrame, url_col: str = "url", tie_col: str | None = None
) -> DataFrame:
    """Keep one row per canonical URL (first by ``tie_col`` if given,
    else an arbitrary-but-deterministic min over the raw URL string).
    The shuffle key is the canonical form — uniform unless one URL
    truly dominates, which is the data telling you something.
    """
    from pyspark.sql import Window

    with_key = df.withColumn("_canon", canonical_url(F.col(url_col)))
    order = F.col(tie_col) if tie_col else F.col(url_col)
    w = Window.partitionBy("_canon").orderBy(order)
    return (
        with_key.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_canon")
    )
