"""Join IVM: the delta rule must equal a full recompute for ANY split of
the inputs into base + insert-only delta (hypothesis-style over seeds)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.ivm import (
    join_delta,
    maintain_join,
)


def _tables(spark, seed):
    a = spark.range(200).select(
        (F.col("id") % 40).alias("k"),
        (F.col("id") * 3 + seed).alias("av"),
    )
    b = spark.range(120).select(
        (F.col("id") % 40).alias("k"),
        (F.col("id") * 7 + seed).alias("bv"),
    )
    return a, b


def _split(df, col, mod, rem):
    return (
        df.filter(F.col(col) % mod != rem),
        df.filter(F.col(col) % mod == rem),
    )


@pytest.mark.parametrize("seed,mod_a,mod_b", [(0, 5, 3), (1, 2, 2), (2, 7, 4)])
def test_delta_rule_equals_full_recompute(spark, seed, mod_a, mod_b):
    a_full, b_full = _tables(spark, seed)
    a, da = _split(a_full, "av", mod_a, 0)
    b, db = _split(b_full, "bv", mod_b, 0)

    base_view = a.join(b, "k")
    maintained = maintain_join(base_view, a, da, b, db, "k")
    recompute = a_full.join(b_full, "k")

    # bag equality: same multiset of rows
    got = sorted(map(tuple, maintained.collect()))
    want = sorted(map(tuple, recompute.collect()))
    assert got == want


def test_empty_deltas_produce_empty_delta(spark):
    a, b = _tables(spark, 0)
    empty = a.filter(F.lit(False))
    empty_b = b.filter(F.lit(False))
    assert join_delta(a, empty, b, empty_b, "k").count() == 0


def test_delta_terms_broadcast_the_delta_side(spark):
    """The scale contract: every term of the delta join broadcasts a
    delta, so base tables are scanned, never shuffled."""
    import contextlib, io, re

    a_full, b_full = _tables(spark, 0)
    a, da = _split(a_full, "av", 5, 0)
    b, db = _split(b_full, "bv", 3, 0)
    df = join_delta(a, da, b, db, "k")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 3
    # no shuffle exchange anywhere in the delta plan
    assert not re.findall(r"\(\d+\) Exchange", plan), plan


def _zrows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_zset_delta_with_deletes_equals_recompute(spark, seed):
    """The Z-set delta rule must equal a recompute for mixed
    insert/delete changes on BOTH sides — the property that makes
    tombstone-free view maintenance sound."""
    from commerce_sessionization_spark.operators.ivm import (
        apply_delta_z,
        as_zset,
        join_delta_z,
        zset_normalize,
    )

    a_full, b_full = _tables(spark, seed)
    a = as_zset(a_full)
    b = as_zset(b_full)
    # delta: delete every row with av%4==0, insert shifted copies
    del_a = as_zset(a_full.filter(F.col("av") % 4 == 0), mult=-1)
    ins_a = as_zset(
        a_full.filter(F.col("av") % 5 == 0).withColumn(
            "av", F.col("av") + 100_000
        )
    )
    da = del_a.unionByName(ins_a)
    del_b = as_zset(b_full.filter(F.col("bv") % 3 == 0), mult=-1)
    db = del_b
    view = zset_normalize(
        as_zset(a_full.join(b_full, "k"))
    )
    maintained = apply_delta_z(view, join_delta_z(a, da, b, db, "k"))

    new_a = a_full.filter(F.col("av") % 4 != 0).unionByName(
        a_full.filter(F.col("av") % 5 == 0).withColumn(
            "av", F.col("av") + 100_000
        )
    )
    new_b = b_full.filter(F.col("bv") % 3 != 0)
    recompute = zset_normalize(as_zset(new_a.join(new_b, "k")))
    assert _zrows(maintained) == _zrows(recompute)
    # all surviving multiplicities are positive bag counts
    assert all(r[-1] > 0 for r in _zrows(maintained))


def test_zset_delete_of_joined_pair_vanishes(spark):
    from commerce_sessionization_spark.operators.ivm import (
        apply_delta_z,
        as_zset,
        join_delta_z,
        zset_normalize,
    )

    a = spark.createDataFrame([(1, "a1")], "k long, av string")
    b = spark.createDataFrame([(1, "b1")], "k long, bv string")
    za, zb = as_zset(a), as_zset(b)
    view = zset_normalize(as_zset(a.join(b, "k")))
    assert view.count() == 1
    # delete the only A row -> the joined pair must vanish entirely
    da = as_zset(a, mult=-1)
    empty_b = as_zset(b.filter(F.lit(False)))
    out = apply_delta_z(view, join_delta_z(za, da, zb, empty_b, "k"))
    assert out.count() == 0


def test_zset_aggregate_maintains_sum_count_under_deletes(spark):
    from commerce_sessionization_spark.operators.ivm import (
        as_zset,
        merge_zset_aggregates,
        zset_aggregate,
    )

    base = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "g long, v long"
    )
    view = zset_aggregate(as_zset(base), ["g"], "v")
    # delete (1, 20), insert (2, 7), delete BOTH of group 2's rows later
    delta = as_zset(
        spark.createDataFrame([(1, 20)], "g long, v long"), mult=-1
    ).unionByName(
        as_zset(spark.createDataFrame([(2, 7)], "g long, v long"))
    )
    v1 = merge_zset_aggregates(view, zset_aggregate(delta, ["g"], "v"), ["g"])
    got = {r.g: (r.n, r.total) for r in v1.collect()}
    assert got == {1: (1, 10), 2: (2, 12)}
    # now delete all of group 2 -> the group disappears from the view
    delta2 = as_zset(
        spark.createDataFrame([(2, 5), (2, 7)], "g long, v long"), mult=-1
    )
    v2 = merge_zset_aggregates(v1, zset_aggregate(delta2, ["g"], "v"), ["g"])
    got2 = {r.g: (r.n, r.total) for r in v2.collect()}
    assert got2 == {1: (1, 10)}


def test_ivm_zset_query_matches_recompute(spark):
    """The catalog query's delta applied to the OLD view must reproduce
    the NEW view exactly — the end-to-end law the first cut of this
    query violated by passing post-delete bases (review finding: pairs
    deleted on both sides came out +1 instead of -1)."""
    from collections import Counter

    from commerce_sessionization_spark.plans.queries import (
        q_ivm_zset_join_delta,
    )
    from commerce_sessionization_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("k")
    )
    cust = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )

    def bag(df):
        return Counter(map(tuple, df.collect()))

    old_view = bag(
        orders.join(cust, "k").select("k", "o_orderkey", "c_mktsegment")
    )
    new_orders = orders.filter(F.col("o_orderkey") % 50 != 0).unionByName(
        orders.filter(F.col("o_orderkey") % 70 == 0).withColumn(
            "o_orderkey", -F.col("o_orderkey")
        )
    )
    new_cust = cust.filter(F.col("k") % 20 != 0)
    new_view = bag(
        new_orders.join(new_cust, "k").select(
            "k", "o_orderkey", "c_mktsegment"
        )
    )
    applied = Counter(old_view)
    for r in q_ivm_zset_join_delta(spark, sf).collect():
        applied[(r.k, r.o_orderkey, r.c_mktsegment)] += r.mult
    applied = Counter({t: n for t, n in applied.items() if n != 0})
    assert applied == new_view
