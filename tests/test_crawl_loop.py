"""The crawl LOOP, end to end: frontier → "fetch" → new outlinks →
frontier round 2 — the composition ``crawl_frontier`` exists for but
that no single-round test exercises.

Reference parity note: the reference pipeline has no crawler; this is
north-star surface. The invariants pinned here are the ones a real
multi-round crawler lives by:

1. the fetched anti-join holds ACROSS rounds — a URL fetched in any
   prior round never re-enters a later frontier;
2. the per-host politeness cap holds in EVERY round independently;
3. discovery progresses — deeper links appear exactly when their
   referrers are fetched — and the loop CONVERGES: once the reachable
   graph is exhausted the frontier comes back empty;
4. in-degree priority is computed per round from the pages fetched so
   far (distinct referrers), so a page linked from everywhere outranks
   a page linked once.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.crawl import (
    crawl_frontier,
    extract_links,
)

#: a three-level synthetic web: seeds → hubs → leaves, with one host
#: ("hub.net") receiving many cross-links (the politeness target) and a
#: back-link cycle (leaf-1 links back to seed-a — the loop must not
#: refetch it).
WEB = {
    "https://seed-a.net/": (
        "<html><body>"
        "<a href='https://hub.net/h1'>1</a>"
        "<a href='https://hub.net/h2'>2</a>"
        "<a href='https://solo.org/only'>s</a>"
        "</body></html>"
    ),
    "https://seed-b.net/": (
        "<html><body>"
        "<a href='https://hub.net/h1'>1</a>"
        "<a href='https://hub.net/h3'>3</a>"
        "</body></html>"
    ),
    "https://hub.net/h1": (
        "<html><body><a href='https://deep.io/d1'>d</a></body></html>"
    ),
    "https://hub.net/h2": (
        "<html><body><a href='https://deep.io/d1'>d</a>"
        "<a href='https://deep.io/d2'>e</a></body></html>"
    ),
    "https://hub.net/h3": "<html><body>terminal page</body></html>",
    "https://solo.org/only": (
        # back-link cycle: points at an already-fetched seed
        "<html><body><a href='https://seed-a.net/'>back</a></body></html>"
    ),
    "https://deep.io/d1": "<html><body>leaf</body></html>",
    "https://deep.io/d2": "<html><body>leaf</body></html>",
}


def _pages(spark, urls):
    return spark.createDataFrame(
        [Row(url=u, html=WEB[u]) for u in urls]
    )


def _crawl_rounds(spark, seeds, per_host_k, max_rounds=10):
    """Drive the loop: fetch whatever the frontier says, accumulate the
    fetched set, stop when the frontier is empty. Returns the per-round
    frontier row lists and the final fetched set."""
    fetched = list(seeds)
    rounds = []
    for _ in range(max_rounds):
        pages = _pages(spark, fetched)
        frontier = crawl_frontier(
            extract_links(pages, "html", "url"),
            pages.select("url"),
            per_host_k=per_host_k,
        ).orderBy(F.desc("n_referrers"), F.asc("url"))
        batch = frontier.collect()
        rounds.append(batch)
        if not batch:
            break
        # "fetch": pages outside our fixture web 404 and contribute
        # nothing (they still count as fetched — real crawlers record
        # failures too, but here every frontier URL exists by
        # construction)
        fetched.extend(r.url for r in batch if r.url in WEB)
    return rounds, fetched


def test_loop_discovers_deeper_levels_and_converges(spark):
    rounds, fetched = _crawl_rounds(
        spark, ["https://seed-a.net/", "https://seed-b.net/"], per_host_k=100
    )
    # round 1: the seeds' direct targets, hub.net/h1 top by in-degree 2
    r1 = {r.url for r in rounds[0]}
    assert r1 == {
        "https://hub.net/h1", "https://hub.net/h2",
        "https://hub.net/h3", "https://solo.org/only",
    }
    assert rounds[0][0].url == "https://hub.net/h1"
    assert rounds[0][0].n_referrers == 2
    # deep.io is invisible until its referrers are fetched
    assert not any(u.startswith("https://deep.io") for u in r1)
    # round 2: exactly the newly-reachable leaves — no refetch of seeds
    # (solo.org/only's back-link to seed-a must NOT resurface it)
    r2 = {r.url for r in rounds[1]}
    assert r2 == {"https://deep.io/d1", "https://deep.io/d2"}
    # d1 has two referrers (h1, h2), d2 one — priority order pinned
    assert rounds[1][0].url == "https://deep.io/d1"
    assert rounds[1][0].n_referrers == 2
    # round 3: the web is exhausted — the loop converges on empty
    assert rounds[2] == []
    assert len(rounds) == 3
    # every page fetched exactly once
    assert sorted(fetched) == sorted(WEB)


def test_fetched_antijoin_holds_across_every_round(spark):
    rounds, _ = _crawl_rounds(
        spark, ["https://seed-a.net/", "https://seed-b.net/"], per_host_k=100
    )
    seen: set[str] = {"https://seed-a.net/", "https://seed-b.net/"}
    for batch in rounds:
        urls = [r.url for r in batch]
        assert len(urls) == len(set(urls))        # no dupes within a round
        assert not (set(urls) & seen), "refetched a previously fetched URL"
        seen |= set(urls)


def test_politeness_cap_holds_in_every_round(spark):
    rounds, fetched = _crawl_rounds(
        spark, ["https://seed-a.net/", "https://seed-b.net/"], per_host_k=1
    )
    for batch in rounds:
        per_host: dict[str, int] = {}
        for r in batch:
            per_host[r.host] = per_host.get(r.host, 0) + 1
            assert r.rank <= 1
        assert all(n <= 1 for n in per_host.values())
    # k=1 stretches hub.net over three rounds (h1 then h2 then h3 by
    # in-degree/url order) — the loop still reaches the whole web
    assert sorted(fetched) == sorted(WEB)
    hub_order = [
        r.url for batch in rounds for r in batch if r.host == "hub.net"
    ]
    assert hub_order == [
        "https://hub.net/h1", "https://hub.net/h2", "https://hub.net/h3",
    ]


def test_streaming_frontier_matches_batch_and_replays_idempotently(
    spark, tmp_path
):
    """The maintainer's two contracts: (a) the epoch-1 frontier over
    incrementally-folded state equals the batch frontier over all pages
    (pure-function law); (b) replaying an epoch rewrites the identical
    artifacts (MVCC idempotency)."""
    from pyspark.sql import Row

    from commerce_sessionization_spark.operators.crawl import (
        crawl_frontier,
        extract_links,
    )
    from commerce_sessionization_spark.streaming.frontier_stream import (
        make_frontier_writer,
        read_frontier,
    )

    pages = spark.createDataFrame(
        [Row(url=u, html=WEB[u]) for u in sorted(WEB)]
    )
    out = str(tmp_path / "frontier_state")
    writer = make_frontier_writer(spark, out, per_host_k=2)
    batches = [
        pages.filter(F.length("url") % 2 == 0),
        pages.filter(F.length("url") % 2 == 1),
    ]
    writer(batches[0], 0)
    writer(batches[1], 1)
    got = {tuple(r) for r in read_frontier(spark, out, 1).collect()}
    want = {tuple(r) for r in crawl_frontier(
        extract_links(pages, "html", "url"), pages.select("url"),
        per_host_k=2,
    ).collect()}
    assert got == want
    # crash-replay of epoch 1: identical rows, no double-fold
    writer(batches[1], 1)
    again = {tuple(r) for r in read_frontier(spark, out, 1).collect()}
    assert again == got
