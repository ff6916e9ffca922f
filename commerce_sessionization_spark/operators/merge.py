"""MERGE INTO (CDC apply): delete / update / insert a change batch into a
snapshot — the batch half of the warehouse-maintenance surface next to SCD2
(``operators/scd.py``) and the streaming MVCC maintainer.

Semantics (classic ``MERGE INTO target USING source ON keys``):

- source row with the delete flag set      → target row removed
- source row matching a target key         → target row replaced (update)
- source row matching nothing              → inserted
- target row matching no source key        → kept unchanged

A CDC batch may carry several versions of one key; ``collapse_batch``
keeps the last writer per key under a total order (sequence column +
key tiebreak), so applying a batch is deterministic and idempotent —
re-applying the same batch is a no-op by construction.

100 TB shape: the naive formulation is a full outer join, which shuffles
the *entire* target. This implementation never does — the target is
scanned once and anti-joined against the batch's key set, then the
surviving upserts are unioned on top:

    target ⟕anti keys(source)   ∪   upserts(source)

A CDC batch is orders of magnitude smaller than the snapshot, so the
anti join broadcasts (plan-asserted in ``tests/test_merge.py``) and the
merge costs one target scan with a map-side filter — no shuffle of the
big side at all. When the batch is genuinely huge, Spark falls back to a
shuffled anti join on the (high-cardinality, uniform) key — still one
pass. Partition-aligned writes then rewrite only affected partitions
(``sources/io.py`` dynamic overwrite), which is how the pattern deploys
against a hive layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_batch(
    source: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Last-writer-wins: keep each key's final version within the batch.

    The order is total — ``seq_col`` descending then ``tiebreak`` columns
    descending — so equal-sequence writes resolve identically everywhere.
    One shuffle on the merge keys; map-side combinable it is not (row
    argmax needs the full row), but the batch is the small side.
    """
    order = [F.col(seq_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        source.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
    broadcast_batch: bool | None = None,
) -> DataFrame:
    """Apply a (collapsed) change batch to a snapshot; returns the new
    snapshot with the target's column set.

    ``source`` must carry every target column (plus optionally
    ``delete_col``); extra source columns are dropped. Collapse the batch
    first (``collapse_batch``) if it can hold >1 version per key —
    this function assumes key-uniqueness of ``source`` and does not
    re-check it (a second window here would double the batch's shuffle).

    ``broadcast_batch``: ``None`` (default) lets Catalyst/AQE pick the
    anti-join strategy from observed sizes; ``True`` pins the broadcast
    for sources whose stats the planner can't see (in-memory frames,
    fresh streams) when the caller KNOWS the batch is small — that is
    the normal CDC situation and the plan this module's contract
    assumes.
    """
    key_list = list(keys)
    if delete_col is not None:
        upserts = source.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).select(*target.columns)
    else:
        upserts = source.select(*target.columns)
    # Every source key leaves the target: deletes stay gone, updates are
    # re-inserted from the batch. One anti join = one target scan.
    key_set = source.select(*key_list).distinct()
    if broadcast_batch:
        key_set = F.broadcast(key_set)
    survivors = target.join(key_set, key_list, "left_anti")
    return survivors.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Change feed between two table snapshots: one row per differing key
    with ``change ∈ {insert, delete, update}`` — the table-diff that
    backfills a CDC stream when the upstream can't emit one (the
    inverse of ``merge_upsert``: diff(old, merge(old, batch)) recovers
    the batch's net effect).

    One full outer join on the key; updates compare via null-safe
    equality so NULL→value and value→NULL both count as changes. At
    scale both sides shuffle once on the key — unavoidable for a diff —
    and unchanged rows (the overwhelming majority) are filtered before
    anything else materializes.
    """
    keys = list(key_cols)
    o = old.select(*keys, *compare_cols)
    n = new.select(*keys, *compare_cols)
    joined = o.alias("o").join(
        n.alias("n"),
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys],
        "full_outer",
    )
    o_present = F.col(f"o.{keys[0]}").isNotNull()
    n_present = F.col(f"n.{keys[0]}").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(~o_present, F.lit("insert"))
        .when(~n_present, F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys
    ]
    old_vals = [F.col(f"o.{c}").alias(f"old_{c}") for c in compare_cols]
    new_vals = [F.col(f"n.{c}").alias(f"new_{c}") for c in compare_cols]
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*out_keys, "change", *old_vals, *new_vals)
    )
