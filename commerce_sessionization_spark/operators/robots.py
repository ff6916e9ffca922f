"""robots.txt (RFC 9309) parsing and corpus filtering.

Training-data pipelines increasingly honor robots exclusions
retroactively: given the robots.txt bodies a crawl captured, drop the
documents whose URLs the site disallowed. That is a per-host rule join,
not a fetch-time concern — which makes it an analytics-engine operator.

``parse_robots_df`` turns (host, robots.txt bytes) rows into per-rule
rows via an Arrow-batched parser (robots files are tiny and one-per-host
— the Python stage is bounded by host count, not corpus size), compiling
each rule's path pattern to an RE2-safe regex (RFC 9309 semantics:
prefix match, ``*`` wildcard, ``$`` end anchor). ``filter_by_robots``
then broadcasts a per-host rules ARRAY against the corpus and resolves
the longest-match-wins / allow-on-tie decision per row with
higher-order functions — all JVM-side, zero corpus-side shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(content: bytes | str, user_agent: str = "*") -> list[dict]:
    """Rules for ``user_agent`` from one robots.txt body.

    Groups are selected per RFC 9309: the most specific matching
    ``User-agent`` line wins (exact product token beats ``*``); rules
    outside any group are ignored. Each rule yields
    ``{allow, pattern, regex, specificity}`` where ``regex`` anchors at
    the path start, ``*`` → ``.*``, trailing ``$`` → end anchor, and
    ``specificity`` is the pattern length (the RFC's tie-breaker).
    """
    text = (
        content.decode("utf-8", "replace")
        if isinstance(content, (bytes, bytearray))
        else content
    )
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_group_body and agents:
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(val.lower())
            in_group_body = False
        elif key in ("allow", "disallow"):
            if agents:
                in_group_body = True
                if val:  # empty Disallow means "allow all": no rule
                    rules.append((key == "allow", val))
        # other directives (sitemap, crawl-delay) end nothing
    if agents:
        groups.append((agents, rules))

    def applies(group_agents: list[str]) -> int:
        # returns match specificity: 2 product token, 1 wildcard, 0 none
        best = 0
        for a in group_agents:
            if a == "*":
                best = max(best, 1)
            elif a and (a in ua or ua == a):
                best = max(best, 2)
        return best

    best_level = max((applies(a) for a, _ in groups), default=0)
    if best_level == 0:
        return []
    out = []
    for group_agents, group_rules in groups:
        if applies(group_agents) != best_level:
            continue
        for allow, pattern in group_rules:
            rx = "^" + re.escape(pattern).replace(r"\*", ".*")
            if rx.endswith(r"\$"):
                rx = rx[:-2] + "$"
            out.append(
                {
                    "allow": allow,
                    "pattern": pattern,
                    "regex": rx,
                    "specificity": len(pattern),
                }
            )
    return out


def sitemaps_from_robots(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "content",
) -> DataFrame:
    """``Sitemap:`` directives from robots.txt bodies — the third leg of
    crawl discovery (RFC 9309 treats the line as an "other record":
    group-independent, any position, case-insensitive key; the value is
    a full sitemap URL per sitemaps.org). Output: one
    (``host_col``, sitemap_url) row per distinct directive — fetch
    those documents and feed them to ``sitemaps.parse_sitemaps`` /
    ``sitemap_frontier_candidates`` to close the loop.

    Pure built-in expressions (anchored line regex + explode): unlike
    the allow/disallow rule compiler — which parses driver-side because
    the per-host body set is dimension-sized and the rules become one
    broadcast table — this extraction stays on the executors, so it
    also works when robots bodies arrive as a corpus-scale crawl
    column.
    """
    urls = F.regexp_extract_all(
        F.col(body_col),
        F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"),
        F.lit(1),
    )
    return (
        robots.select(F.col(host_col), F.explode(urls).alias("sitemap_url"))
        .distinct()
    )


def parse_robots_df(
    robots: DataFrame,
    host_col: str = "host",
    content_col: str = "content",
    user_agent: str = "*",
) -> DataFrame:
    """(host, robots.txt payload) rows → one row per applicable rule:
    (host, allow, pattern, regex, specificity)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for host, content in zip(pdf[host_col], pdf[content_col]):
                payload = (
                    bytes(content)
                    if not isinstance(content, str)
                    else content
                )
                for r in parse_robots(payload, user_agent):
                    rows.append({"host": host, **r})
            yield pd.DataFrame(
                rows,
                columns=["host", "allow", "pattern", "regex", "specificity"],
            )

    return robots.mapInPandas(
        batches,
        "host string, allow boolean, pattern string, regex string, "
        "specificity long",
    )


def filter_by_robots(
    corpus: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    keep_unmatched: bool = True,
) -> DataFrame:
    """Drop corpus rows whose URL the host's robots rules disallow.

    RFC 9309 decision: among rules whose pattern matches the URL path,
    the most specific (longest pattern) wins; on a tie, allow wins.
    URLs on hosts with no rules — or matching no rule — are allowed
    (``keep_unmatched``).

    Scale shape: the decision is purely per-row, so the corpus must not
    shuffle for it. Rules collapse host-side to one
    ``host → array<struct<regex, allow, specificity>>`` row (the only
    Exchange, bounded by host count, then broadcast); each corpus row
    resolves its own argmax in array-land — ``filter`` keeps the rules
    whose regex matches the path, ``array_max`` over
    ``struct(specificity, allow)`` is exactly longest-wins/allow-on-tie
    (struct ordering compares fields left to right, ``true > false``).
    Zero corpus-side Exchange, zero Window — plan-asserted in
    ``tests/test_plans.py``.
    """
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1)
    )
    path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    keyed = corpus.withColumn("_host", host).withColumn("_path", path)

    per_host = rules.groupBy(F.col("host").alias("_rhost")).agg(
        F.collect_list(
            F.struct(
                F.col("regex"), F.col("allow"), F.col("specificity")
            )
        ).alias("_rules")
    )
    joined = keyed.join(
        F.broadcast(per_host), F.col("_host") == F.col("_rhost"), "left"
    )
    best = F.array_max(
        F.transform(
            F.filter(
                F.col("_rules"),
                lambda r: F.regexp_like(F.col("_path"), r["regex"]),
            ),
            lambda r: F.struct(
                r["specificity"].alias("specificity"),
                r["allow"].alias("allow"),
            ),
        )
    )
    allowed = F.coalesce(best["allow"], F.lit(bool(keep_unmatched)))
    return joined.filter(allowed).select(*corpus.columns)
