"""robots.txt (RFC 9309): group selection, pattern compilation,
longest-match/allow-tie decision, and the broadcast corpus filter.
"""

from __future__ import annotations

from commerce_sessionization_spark.operators.robots import (
    filter_by_robots,
    parse_robots,
    parse_robots_df,
)

ROBOTS = b"""
# fixture with two groups and the directive zoo
User-agent: GoodBot
Disallow: /private/
Allow: /private/press/

User-agent: *
Disallow: /tmp/*
Disallow: /draft$
Disallow:
Crawl-delay: 5
Sitemap: https://e.com/s.xml
"""


def test_group_selection_product_token_beats_wildcard():
    star = parse_robots(ROBOTS, "somebot")
    assert {r["pattern"] for r in star} == {"/tmp/*", "/draft$"}
    good = parse_robots(ROBOTS, "GoodBot/1.0 (+https://x)")
    assert {r["pattern"] for r in good} == {"/private/", "/private/press/"}


def test_pattern_compilation_wildcard_and_anchor():
    rules = {r["pattern"]: r["regex"] for r in parse_robots(ROBOTS)}
    assert rules["/tmp/*"] == "^/tmp/.*"
    assert rules["/draft$"] == "^/draft$"
    # empty Disallow contributed no rule
    assert "" not in rules


def test_no_matching_group_means_no_rules():
    only_bot = b"User-agent: OtherBot\nDisallow: /\n"
    assert parse_robots(only_bot, "mybot") == []


def test_specificity_is_pattern_length():
    rules = parse_robots(ROBOTS, "GoodBot")
    by_pattern = {r["pattern"]: r["specificity"] for r in rules}
    assert by_pattern["/private/press/"] > by_pattern["/private/"]


def test_filter_by_robots_decision_matrix(spark):
    rdf = parse_robots_df(
        spark.createDataFrame(
            [("e.com", bytearray(ROBOTS))], "host string, content binary"
        )
    )
    corpus = spark.createDataFrame(
        [
            (1, "https://e.com/public/a"),  # no rule: kept
            (2, "https://e.com/tmp/x/y"),  # /tmp/* : dropped
            (3, "https://e.com/draft"),  # /draft$ : dropped
            (4, "https://e.com/drafts"),  # $ anchor miss: kept
            (5, "https://other.com/tmp/z"),  # host without rules: kept
        ],
        ["id", "url"],
    )
    kept = sorted(r["id"] for r in filter_by_robots(corpus, rdf).collect())
    assert kept == [1, 4, 5]


def test_filter_longest_match_allow_wins(spark):
    rdf = parse_robots_df(
        spark.createDataFrame(
            [("e.com", bytearray(ROBOTS))], "host string, content binary"
        ),
        user_agent="GoodBot",
    )
    corpus = spark.createDataFrame(
        [
            (1, "https://e.com/private/secret"),  # Disallow /private/
            (2, "https://e.com/private/press/rel"),  # longer Allow wins
        ],
        ["id", "url"],
    )
    kept = sorted(r["id"] for r in filter_by_robots(corpus, rdf).collect())
    assert kept == [2]


def test_filter_preserves_duplicate_rows(spark):
    rdf = parse_robots_df(
        spark.createDataFrame(
            [("e.com", bytearray(b"User-agent: *\nDisallow: /x\n"))],
            "host string, content binary",
        )
    )
    corpus = spark.createDataFrame(
        [(1, "https://e.com/ok"), (1, "https://e.com/ok")], ["id", "url"]
    )
    assert filter_by_robots(corpus, rdf).count() == 2  # no silent dedup


def test_rules_join_is_broadcast(spark):
    rdf = parse_robots_df(
        spark.createDataFrame(
            [("e.com", bytearray(ROBOTS))], "host string, content binary"
        )
    )
    corpus = spark.createDataFrame([(1, "https://e.com/a")], ["id", "url"])
    plan = (
        filter_by_robots(corpus, rdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
