"""Contracts for ``operators/entity.py::blocked_match_pairs`` — the
reusable capped-and-segment-blocked fuzzy matcher behind
``customer_entity_resolution``.

Three contracts make it scale-safe (cf. tests/test_entity_blocking.py,
whose (lang, source)-key hazard this operator generalizes the fix for):

1. **Recall 1.0** — for exact-key blocks within ``max_block``, output is
   byte-identical to the naive block-equality + padded-prefix
   levenshtein self-join, including insert/delete edits that SHIFT
   segments (the ±max_dist probe window exists precisely for them).
2. **The cap is a junk-key guard** — an exact-key block larger than
   ``max_block`` produces NO pairs, while sibling blocks are untouched.
3. **Candidate keys are content-derived** — distinct (key, segment)
   blocks outnumber the records, so pair generation inside a single hot
   exact-key stays bounded by content agreement, not block size.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.entity import (
    blocked_match_pairs,
    passjoin_segments,
)


def test_segment_template_tiles_the_window():
    for prefix_len, max_dist in [(20, 5), (24, 3), (16, 2), (7, 6)]:
        segs = passjoin_segments(prefix_len, max_dist)
        assert len(segs) == max_dist + 1
        assert segs[0][1] == 1
        # contiguous, gap-free tiling of exactly prefix_len chars
        for (_, s0, l0), (_, s1, _) in zip(segs, segs[1:]):
            assert s1 == s0 + l0
        assert segs[-1][1] + segs[-1][2] - 1 == prefix_len
        assert all(ln >= 1 for _, _, ln in segs)
    # the known template: matches queries.py's hand-written _FPP_SEGMENTS
    assert passjoin_segments(20, 5) == [
        (0, 1, 4), (1, 5, 4), (2, 9, 3), (3, 12, 3), (4, 15, 3), (5, 18, 3),
    ]


def test_segment_template_rejects_windows_too_small():
    with pytest.raises(ValueError):
        passjoin_segments(3, 5)


def _records(spark, rows):
    return spark.createDataFrame(
        [Row(rid=i, key=k, name=n) for i, k, n in rows]
    )


def _naive(df, max_dist=3, prefix_len=20):
    pad = lambda c: F.rpad(F.substring(c, 1, prefix_len), prefix_len, "\x01")  # noqa: E731
    l, r = df.alias("l"), df.alias("r")
    return (
        l.join(
            r,
            (F.col("l.key") == F.col("r.key"))
            & (F.col("l.rid") < F.col("r.rid")),
        )
        .select(
            F.col("l.rid").alias("a"),
            F.col("r.rid").alias("b"),
            F.levenshtein(
                pad(F.col("l.name")), pad(F.col("r.name"))
            ).cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


BASE = "the quick brown fox jumps"


@pytest.fixture(scope="module")
def crafted(spark):
    """Edits of every kind at varying positions, plus key separation.

    Substitutions keep segment alignment; insertions/deletions shift
    every later segment — the adversarial case for positional blocking.
    """
    return _records(spark, [
        (0, "k1", BASE),
        (1, "k1", "tXe quick brown fox jumps"),    # 1 substitution
        (2, "k1", "tXe qXick bXown fox jumps"),    # 3 subs (= threshold)
        (3, "k1", "tXe qXick bXowX fox jumps"),    # 4 subs (> threshold)
        # NB threshold is 3 and the metric is the PADDED 20-char window:
        # a front shift of s chars costs 2s (s edits + s tail chars
        # pushed out of the window), so shifts here are 1 char
        (4, "k1", "Zthe quick brown fox jump"),    # 1 front insertion
        (5, "k1", "he quick brown fox jumps "),    # 1 front deletion
        (6, "k1", "thZe quik brown fox jumps"),    # insert + delete mix
        (7, "k2", BASE),                           # other key: never pairs
        (8, "k1", "completely different text"),
    ])


def test_blocked_equals_naive_on_crafted_edits(spark, crafted):
    got = {tuple(r) for r in blocked_match_pairs(
        crafted, "rid", "name", ["key"], max_dist=3, prefix_len=20
    ).collect()}
    want = {tuple(r) for r in _naive(crafted).collect()}
    assert got == want
    pairs = {(a, b) for a, b, _ in want}
    assert (0, 1) in pairs          # substitution
    assert (0, 2) in pairs          # exactly at threshold
    assert (0, 3) not in pairs      # beyond threshold
    assert (0, 4) in pairs          # pure insertions (shifted segments)
    assert (0, 5) in pairs          # pure deletions (shifted segments)
    assert (0, 6) in pairs          # mixed edit script
    assert all(7 not in p for p in pairs)  # exact-key gate


def test_blocked_equals_naive_on_testdata_documents(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            F.col("doc_id").alias("rid"),
            F.col("lang").alias("key"),
            F.col("text").alias("name"),
        )
    )
    got = {tuple(r) for r in blocked_match_pairs(
        docs, "rid", "name", ["key"], max_dist=3, prefix_len=20
    ).collect()}
    want = {tuple(r) for r in _naive(docs).collect()}
    assert got == want


def test_max_block_excludes_oversize_blocks_only(spark):
    # a junk block ("UNKNOWN" phone) of 5 identical-name records, plus a
    # legitimate block of 3 — cap at 4: junk yields nothing, the
    # legitimate block is untouched
    rows = [(i, "UNKNOWN", "same name here") for i in range(5)]
    rows += [(10, "k9", BASE), (11, "k9", BASE), (12, "k9", "tXe quick brown fox jumps")]
    df = _records(spark, rows)
    capped = blocked_match_pairs(
        df, "rid", "name", ["key"], max_dist=3, prefix_len=20, max_block=4
    )
    got = {(r.a, r.b) for r in capped.collect()}
    assert got == {(10, 11), (10, 12), (11, 12)}
    # with no cap the junk block floods back in (10 within-block pairs)
    uncapped = blocked_match_pairs(
        df, "rid", "name", ["key"], max_dist=3, prefix_len=20
    )
    assert uncapped.count() == 10 + 3


def test_candidate_blocks_are_content_derived(spark):
    """The scalability contract the uncapped single-key join violated:
    inside ONE hot exact-key, candidate keys must be drawn from record
    content, so distinct candidate blocks outnumber the records and the
    hottest candidate block stays a small constant."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            F.col("doc_id").alias("rid"),
            F.lit("hot").alias("key"),  # everyone in one exact block
            F.col("text").alias("name"),
        )
    )
    n = docs.count()
    segs = passjoin_segments(20, 3)
    pad = F.rpad(F.substring("name", 1, 20), 20, "\x01")
    keys = docs.select(
        "rid",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("i"),
                     F.substring(pad, s, ln).alias("v"))
            for i, s, ln in segs
        ])).alias("seg"),
    ).select(F.col("seg.i").alias("i"), F.col("seg.v").alias("v"))
    blocks = keys.groupBy("i", "v").count()
    n_blocks = blocks.count()
    max_block = blocks.agg(F.max("count")).first()[0]
    assert n_blocks > n          # more candidate blocks than records
    # hottest candidate block is a corpus sliver, not the whole hot key
    # (the uncapped single-key join would put all n records in one block)
    assert max_block <= max(4, n // 10)
