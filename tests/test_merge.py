"""MERGE INTO (CDC apply) semantics + the one-target-scan plan contract."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Row

from commerce_sessionization_spark.operators.merge import (
    collapse_batch,
    merge_upsert,
)


def _snapshot(spark):
    return spark.createDataFrame(
        [
            Row(k=1, name="a", bal=10.0),
            Row(k=2, name="b", bal=20.0),
            Row(k=3, name="c", bal=30.0),
        ]
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_update_insert_delete_keep(spark):
    target = _snapshot(spark)
    batch = spark.createDataFrame(
        [
            Row(k=2, name="b2", bal=99.0, deleted=False),   # update
            Row(k=3, name="c", bal=30.0, deleted=True),     # delete
            Row(k=4, name="d", bal=40.0, deleted=False),    # insert
        ]
    )
    out = merge_upsert(target, batch, ["k"], delete_col="deleted")
    assert _rows(out) == {
        (1, "a", 10.0),      # untouched
        (2, "b2", 99.0),
        (4, "d", 40.0),
    }


def test_merge_without_delete_col_is_pure_upsert(spark):
    target = _snapshot(spark)
    batch = spark.createDataFrame([Row(k=1, name="a9", bal=1.0)])
    out = merge_upsert(target, batch, ["k"])
    assert _rows(out) == {(1, "a9", 1.0), (2, "b", 20.0), (3, "c", 30.0)}


def test_collapse_last_writer_wins_with_tiebreak(spark):
    batch = spark.createDataFrame(
        [
            Row(k=1, name="v1", bal=1.0, seq=1, src=1),
            Row(k=1, name="v2", bal=2.0, seq=2, src=1),
            # equal seq: src tiebreak decides, higher wins
            Row(k=1, name="v3a", bal=3.0, seq=3, src=1),
            Row(k=1, name="v3b", bal=4.0, seq=3, src=2),
            Row(k=2, name="w1", bal=5.0, seq=1, src=1),
        ]
    )
    got = _rows(
        collapse_batch(batch, ["k"], "seq", tiebreak=["src"]).select(
            "k", "name", "bal"
        )
    )
    assert got == {(1, "v3b", 4.0), (2, "w1", 5.0)}


def test_merge_is_idempotent(spark):
    target = _snapshot(spark)
    batch = spark.createDataFrame(
        [
            Row(k=2, name="b2", bal=99.0, deleted=False),
            Row(k=3, name="c", bal=30.0, deleted=True),
            Row(k=4, name="d", bal=40.0, deleted=False),
        ]
    )
    once = merge_upsert(target, batch, ["k"], delete_col="deleted")
    twice = merge_upsert(once, batch, ["k"], delete_col="deleted")
    assert _rows(once) == _rows(twice)


def test_merge_anti_join_broadcasts_small_batch(spark):
    """The 100 TB contract: the target is NOT shuffled — the batch's key
    set broadcasts into a map-side anti join (one scan of the big side)."""
    target = _snapshot(spark)
    batch = spark.createDataFrame([Row(k=2, name="b2", bal=9.0)])
    out = merge_upsert(target, batch, ["k"], broadcast_batch=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


class TestSnapshotDiff:
    def _old_new(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 4.0)],
            "k long, s string, v double",
        )
        new = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (4, None, 4.0), (5, "e", 50.0)],
            "k long, s string, v double",
        )
        return old, new

    def test_change_classification(self, spark):
        from commerce_sessionization_spark.operators.merge import snapshot_diff

        old, new = self._old_new(spark)
        got = {r.k: r.change for r in
               snapshot_diff(old, new, ("k",), ("s", "v")).collect()}
        # 1 unchanged (absent), 2 NULL->20.0 update, 3 deleted, 4
        # unchanged incl. NULL attr (absent), 5 inserted
        assert got == {2: "update", 3: "delete", 5: "insert"}

    def test_old_new_values_carried(self, spark):
        from commerce_sessionization_spark.operators.merge import snapshot_diff

        old, new = self._old_new(spark)
        rows = {r.k: r for r in
                snapshot_diff(old, new, ("k",), ("s", "v")).collect()}
        assert rows[2].old_v is None and rows[2].new_v == 20.0
        assert rows[3].new_s is None and rows[3].old_s == "c"
        assert rows[5].old_s is None and rows[5].new_v == 50.0

    def test_diff_of_identical_snapshots_is_empty(self, spark):
        from commerce_sessionization_spark.operators.merge import snapshot_diff

        old, _ = self._old_new(spark)
        assert snapshot_diff(old, old, ("k",), ("s", "v")).count() == 0


def test_diff_recovers_merge_net_effect(spark):
    """Cross-operator law: snapshot_diff(old, merge_upsert(old, batch))
    classifies exactly the batch's NET changes — inserts for new keys,
    deletes for tombstoned existing keys, updates only where a value
    actually moved (no-op upserts vanish from the diff)."""
    import random

    from commerce_sessionization_spark.operators.merge import (
        merge_upsert,
        snapshot_diff,
    )

    rng = random.Random(11)
    old_rows = [(k, rng.choice("abc"), float(rng.randrange(100)))
                for k in range(40)]
    old = spark.createDataFrame(old_rows, "k long, s string, v double")
    expected = {}
    batch_rows = []
    old_by_k = {k: (s, v) for k, s, v in old_rows}
    for k in range(60):
        action = rng.choice(["skip", "insert", "delete", "update", "noop"])
        if k < 40:
            if action == "insert":
                action = "update"
        else:
            if action in ("delete", "update", "noop"):
                action = "insert" if action == "insert" else "skip"
        if action == "skip":
            continue
        if action == "insert":
            batch_rows.append((k, "z", 999.0, False))
            expected[k] = "insert"
        elif action == "delete":
            s, v = old_by_k[k]
            batch_rows.append((k, s, v, True))
            expected[k] = "delete"
        elif action == "update":
            batch_rows.append((k, "u", -1.0, False))
            expected[k] = "update"
        elif action == "noop":
            s, v = old_by_k[k]
            batch_rows.append((k, s, v, False))  # re-upsert same values
    batch = spark.createDataFrame(
        batch_rows, "k long, s string, v double, deleted boolean"
    )
    new = merge_upsert(old, batch, keys=("k",), delete_col="deleted",
                       broadcast_batch=True)
    got = {r.k: r.change
           for r in snapshot_diff(old, new, ("k",), ("s", "v")).collect()}
    assert got == expected
