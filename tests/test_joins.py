"""asof_join semantics: directions, tolerance, exact-match handling, nulls.

The catalog query cross-checks the backward default against DuckDB's native
ASOF JOIN; these tests pin the option matrix on hand-computable fixtures.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from commerce_sessionization_spark.operators.joins import asof_join, range_join

L_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)
R_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("tag", StringType()),
    ]
)


def ts(s: str) -> datetime:
    return datetime.strptime(s, "%H:%M:%S").replace(year=2024, month=1, day=1)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 1, ts("10:00:00")),
            (2, 1, ts("10:30:00")),
            (3, 2, ts("10:05:00")),  # user 2 has no earlier right row
        ],
        L_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            (1, ts("09:50:00"), "a"),
            (1, ts("10:30:00"), "b"),  # exactly at left id=2
            (1, ts("11:00:00"), "c"),
            (2, ts("10:10:00"), "d"),  # after user 2's left row
        ],
        R_SCHEMA,
    )
    return left, right


def result_map(df):
    return {r.id: (r.right_tag, r.right_ts) for r in df.collect()}


def test_backward(sides):
    left, right = sides
    got = result_map(asof_join(left, right, right_cols=("tag",)))
    assert got[1] == ("a", ts("09:50:00"))
    assert got[2] == ("b", ts("10:30:00"))  # exact match allowed by default
    assert got[3] == (None, None)


def test_backward_excluding_exact(sides):
    left, right = sides
    got = result_map(
        asof_join(left, right, right_cols=("tag",), allow_exact_matches=False)
    )
    assert got[2] == ("a", ts("09:50:00"))  # 10:30 right row no longer eligible


def test_forward(sides):
    left, right = sides
    got = result_map(asof_join(left, right, right_cols=("tag",), direction="forward"))
    assert got[1] == ("b", ts("10:30:00"))
    assert got[2] == ("b", ts("10:30:00"))
    assert got[3] == ("d", ts("10:10:00"))


def test_tolerance(sides):
    left, right = sides
    got = result_map(
        asof_join(left, right, right_cols=("tag",), tolerance_seconds=300)
    )
    assert got[1] == (None, None)  # 09:50 is 10 min back, > 5 min tolerance
    assert got[2] == ("b", ts("10:30:00"))


def test_row_count_preserved(sides):
    left, right = sides
    assert asof_join(left, right, right_cols=("tag",)).count() == left.count()


def test_range_join_interval(spark, sides):
    left, right = sides
    joined = range_join(
        left.select(F.col("user_id").alias("u"), F.col("ts").alias("lts"), "id"),
        right,
        on=F.col("u") == F.col("user_id"),
        interval=(F.col("ts") >= F.col("lts"))
        & (F.col("ts") <= F.col("lts") + F.expr("INTERVAL 30 MINUTES")),
    )
    got = {(r.id, r.tag) for r in joined.collect()}
    # inclusive bounds: id=2 (10:30) matches both b (10:30) and c (11:00)
    assert got == {(1, "b"), (2, "b"), (2, "c"), (3, "d")}


@pytest.mark.parametrize("seed,direction", [(3, "backward"), (11, "backward"), (3, "forward")])
def test_asof_fuzz_vs_pandas_merge_asof(spark, seed, direction):
    """Cross-validate against pandas.merge_asof on randomized fixtures —
    an independent reference implementation of as-of semantics."""
    import random

    import pandas as pd

    rng = random.Random(seed)
    base = ts("08:00:00")
    lrows, rrows = [], []
    for user in (1, 2, 3):
        t = 0
        for i in range(rng.randint(3, 25)):
            t += rng.randint(1, 900)
            lrows.append((user * 1000 + i, user, base + pd.Timedelta(seconds=t)))
        t = 0
        for i in range(rng.randint(3, 25)):
            t += rng.randint(1, 900)
            rrows.append((user, base + pd.Timedelta(seconds=t), f"t{user}_{i}"))
    left = spark.createDataFrame(lrows, L_SCHEMA)
    right = spark.createDataFrame(rrows, R_SCHEMA)

    got = {
        r.id: r.right_tag
        for r in asof_join(
            left, right, right_cols=("tag",), direction=direction
        ).collect()
    }

    lpd = pd.DataFrame(lrows, columns=["id", "user_id", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["user_id", "ts", "tag"]).sort_values("ts")
    merged = pd.merge_asof(
        lpd, rpd, on="ts", by="user_id", direction=direction
    )
    expected = {
        int(r.id): (None if pd.isna(r.tag) else r.tag) for r in merged.itertuples()
    }
    assert got == expected


def test_salted_join_equals_plain_join(spark):
    from commerce_sessionization_spark.operators.joins import salted_join

    # heavily skewed: 90% of left rows share key 1; dup keys on both sides
    left = spark.createDataFrame(
        [(i, 1 if i % 10 else 2, f"l{i}") for i in range(200)],
        "id long, k long, lv string",
    )
    right = spark.createDataFrame(
        [(1, "r1a"), (1, "r1b"), (2, "r2"), (3, "r3")], "k long, rv string"
    )
    for how in ("inner", "left"):
        plain = sorted(
            (r.id, r.k, r.lv, r.rv)
            for r in left.join(right, "k", how).collect()
        )
        salted = sorted(
            (r.id, r.k, r.lv, r.rv)
            for r in salted_join(left, right, "k", n_salts=4, how=how).collect()
        )
        assert salted == plain, how


def test_bloom_filtered_join_equals_plain_join(spark):
    from commerce_sessionization_spark.operators.joins import bloom_filtered_join

    left = spark.range(0, 5000).selectExpr("id AS k", "id * 2 AS v")
    right = spark.range(0, 5000).filter("id % 50 = 0").selectExpr(
        "id AS k", "id + 1 AS w"
    )
    for how in ("inner", "left_semi"):
        got = sorted(map(tuple, bloom_filtered_join(left, right, "k", how).collect()))
        want = sorted(map(tuple, left.join(right, "k", how).collect()))
        assert got == want, how


def test_bloom_filtered_join_prunes_before_exchange(spark):
    """The point of the operator: the bloom filter must sit UNDER the
    join's exchange so pruned rows never shuffle."""
    import contextlib
    import io
    import re

    from commerce_sessionization_spark.operators.joins import bloom_filtered_join

    left = spark.range(0, 10000).selectExpr("id AS k", "id AS v")
    right = spark.range(0, 100).selectExpr("id * 97 AS k", "id AS w")
    # force the shuffle regime (no broadcast of right as rows)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bloom_filtered_join(left, right, "k")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # the bloom probe (a forall over the k hash positions) must be
        # evaluated BELOW the join's left-side Exchange — Catalyst fuses
        # the crossJoin+filter into a BroadcastNestedLoopJoin condition,
        # so locate the node holding the forall and the Exchange feeding
        # the SMJ's left Sort, and compare tree depth via node ids
        # (children have smaller ids than their ancestors here)
        import re as _re

        probe = _re.search(r"\((\d+)\) \w+[\s\S]{0,600}?forall", plan)
        sort_exch = _re.search(r":- Sort \((\d+)\)\s*\n\s*:\s*\+- Exchange \((\d+)\)", plan)
        assert probe and sort_exch, plan
        assert int(probe.group(1)) < int(sort_exch.group(2)), plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bloom_filtered_join_actually_prunes(spark):
    from commerce_sessionization_spark.operators.joins import (
        _bloom_words,
        _probe_positions,
        bloom_filtered_join,
    )
    from pyspark.sql import functions as F

    left = spark.range(0, 20000).selectExpr("id AS k")
    right = spark.range(0, 20).selectExpr("id * 1000 AS k")
    bitmap = _bloom_words(right, "k", m=8192, k=3)
    survivors = (
        left.crossJoin(F.broadcast(bitmap))
        .filter(
            F.forall(
                _probe_positions(F.col("k"), 8192, 3),
                lambda p: (
                    F.element_at(F.col("_bw"), (p / 32).cast("int") + 1)
                    .bitwiseAND(
                        F.pow(F.lit(2.0), (p % 32).cast("int")).cast("long")
                    )
                    != 0
                ),
            )
        )
        .count()
    )
    # 20 true keys; false-positive rate with m=8192,k=3,n=20 is ~0 —
    # allow a loose bound while proving >99% of rows never shuffle
    assert survivors < 200, survivors
    assert bloom_filtered_join(left, right, "k").count() == 20
