"""Market-basket association rules: exact counts on a hand-built basket
set, support pruning before the quadratic stage, and plan shape (the
frequent-item join must be broadcast, the self-join keyed on basket).
"""

from __future__ import annotations

import pytest

from commerce_sessionization_spark.operators.basket import association_rules

# 10 baskets: {milk, bread} co-occur in 4, {milk, eggs} in 2, and "caviar"
# appears once (infrequent — must never reach the pair stage).
BASKETS = [
    (1, "milk"), (1, "bread"), (1, "eggs"),
    (2, "milk"), (2, "bread"),
    (3, "milk"), (3, "bread"),
    (4, "milk"), (4, "bread"),
    (5, "milk"), (5, "eggs"),
    (6, "bread"),
    (7, "eggs"),
    (8, "milk"),
    (9, "caviar"),
    (10, "bread"), (10, "bread"),  # duplicate item: set semantics
]


@pytest.fixture(scope="module")
def baskets(spark):
    return spark.createDataFrame(BASKETS, ["order_id", "item"])


def test_rule_counts_confidence_lift(spark, baskets):
    rules = {
        (r["antecedent"], r["consequent"]): r.asDict()
        for r in association_rules(
            baskets, "order_id", "item", min_support=0.2
        ).collect()
    }
    mb = rules[("milk", "bread")]
    # milk in 6 baskets, bread in 6, together in 4, n=10
    assert mb["pair_count"] == 4
    assert mb["antecedent_count"] == 6
    assert mb["confidence"] == pytest.approx(4 / 6)
    assert mb["lift"] == pytest.approx((4 / 6) * 10 / 6)
    bm = rules[("bread", "milk")]
    assert bm["confidence"] == pytest.approx(4 / 6)
    assert bm["lift"] == mb["lift"]  # lift is symmetric
    # milk+eggs: 2/10 = exactly min_support, included
    assert rules[("milk", "eggs")]["pair_count"] == 2


def test_infrequent_items_pruned(spark, baskets):
    rules = association_rules(
        baskets, "order_id", "item", min_support=0.2
    ).collect()
    items = {r["antecedent"] for r in rules} | {
        r["consequent"] for r in rules
    }
    assert "caviar" not in items
    # eggs appears in 3 baskets (support .3) but pairs only via milk
    assert ("eggs", "bread") not in {
        (r["antecedent"], r["consequent"]) for r in rules
    }


def test_min_confidence_filters_directionally(spark, baskets):
    # confidence(eggs->milk) = 2/3; confidence(milk->eggs) = 2/6
    rules = {
        (r["antecedent"], r["consequent"])
        for r in association_rules(
            baskets, "order_id", "item", min_support=0.2, min_confidence=0.5
        ).collect()
    }
    assert ("eggs", "milk") in rules
    assert ("milk", "eggs") not in rules


def test_duplicate_items_use_set_semantics(spark, baskets):
    rules = association_rules(baskets, "order_id", "item", min_support=0.1)
    counts = {
        r["antecedent"]: r["antecedent_count"] for r in rules.collect()
    }
    assert counts["bread"] == 6  # basket 10's duplicate counted once


def test_frequent_item_join_is_broadcast(spark, baskets):
    plan = (
        association_rules(baskets, "order_id", "item", min_support=0.2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
