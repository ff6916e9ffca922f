"""Synthetic partsupp invariants (plans/queries.py synth_partsupp).

The testdata ships no partsupp, so Q2/Q9/Q11/Q20 derive one inline —
deterministically and identically in Spark and DuckDB (the driver's
oracle can only see the ten registered views). These pin the structural
guarantees the four queries rely on; cross-engine value parity is the
oracle's job (min_cost_supplier / product_type_profit / important_stock
/ promotable_suppliers, all driver-checkable).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from commerce_sessionization_spark.plans.queries import synth_partsupp
from commerce_sessionization_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_partsupp_key_is_unique(spark):
    ps = synth_partsupp(spark, SF_DIR)
    assert ps.count() == ps.select("ps_partkey", "ps_suppkey").distinct().count()


def test_every_lineitem_pair_has_a_partsupp_row(spark):
    """TPC-H referential integrity: the Q9 join must never drop a line."""
    ps = synth_partsupp(spark, SF_DIR)
    li = load_table(spark, SF_DIR, "lineitem")
    orphans = (
        li.select(F.col("l_partkey").alias("ps_partkey"),
                  F.col("l_suppkey").alias("ps_suppkey"))
        .distinct()
        .join(ps, ["ps_partkey", "ps_suppkey"], "left_anti")
    )
    assert orphans.count() == 0


def test_every_part_has_at_least_four_suppliers(spark):
    """Q2 needs suppliers even for never-ordered parts (formula branch)."""
    ps = synth_partsupp(spark, SF_DIR)
    part = load_table(spark, SF_DIR, "part")
    n_parts = part.count()
    with_4 = (
        ps.groupBy("ps_partkey").count().filter(F.col("count") >= 4).count()
    )
    assert with_4 == n_parts


def test_attributes_are_pure_functions_of_the_key(spark):
    ps = synth_partsupp(spark, SF_DIR).collect()
    for r in ps:
        p, s = r["ps_partkey"], r["ps_suppkey"]
        assert r["ps_availqty"] == (p * 7 + s * 3) % 9999 + 1
        assert r["ps_supplycost"] == ((p * 31 + s * 17) % 100000 + 100) * 0.01
        assert 1 <= r["ps_availqty"] <= 9999
        assert 1.0 <= r["ps_supplycost"] <= 1001.0
