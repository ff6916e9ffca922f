"""Tier-c Python UDTFs: LATERAL table functions (Spark 4 API)."""

from __future__ import annotations

from pyspark.sql.functions import lit

from commerce_sessionization_spark.functions.udtfs import (
    ParseKV,
    SlidingChunks,
    register_udtfs,
)


def test_parse_kv_dataframe_and_lateral_sql(spark):
    rows = sorted(map(tuple, ParseKV(lit("a=1; b=2;c=;=x")).collect()))
    assert rows == [("a", "1"), ("b", "2"), ("c", "")]

    register_udtfs(spark)
    got = sorted(
        map(
            tuple,
            spark.sql(
                """
        SELECT t.id, p.key, p.value
        FROM VALUES (1, 'x=9;y=8'), (2, 'z=7'), (3, '') AS t(id, s),
        LATERAL parse_kv(t.s) AS p
        """
            ).collect(),
        )
    )
    assert got == [(1, "x", "9"), (1, "y", "8"), (2, "z", "7")]


def test_sliding_chunks_covers_text_with_overlap(spark):
    register_udtfs(spark)
    got = spark.sql(
        "SELECT * FROM sliding_chunks('abcdefgh', 4, 3)"
    ).collect()
    assert [(r.start, r.chunk) for r in got] == [
        (0, "abcd"), (3, "defg"), (6, "gh"),
    ]
    # every character covered, adjacent chunks overlap by size - step
    text = "abcdefgh"
    covered = set()
    for r in got:
        covered |= set(range(r.start, r.start + r.length))
    assert covered == set(range(len(text)))
