"""Incremental view maintenance (IVM) for joins.

``operators/rollup.py`` maintains AGGREGATE views incrementally (partial
states + an exact merge law); this module does the same for JOIN views —
the other half of warehouse view maintenance. Given a materialized
``A ⋈ B`` and insert-only deltas ``ΔA``, ``ΔB``, the classic delta rule

    Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

produces exactly the new join rows under bag semantics, provided the
deltas are disjoint from their bases (insert-only; deletes/updates are
handled upstream as tombstone + re-insert, cf. ``operators/merge.py``).

Why this matters at 100 TB: a day's increment is orders of magnitude
smaller than the base tables, so every term of the delta has a SMALL
side — Spark broadcasts ΔA into the scan of B and ΔB into the scan of A,
and the maintenance job never shuffles a base table (the thing a full
recompute must do). The explicit ``broadcast`` hints below encode that
size asymmetry, which Catalyst cannot know statically; drop to plain
joins if a "delta" is not actually small.

The law is property-tested (`tests/test_ivm.py`: maintained == full
recompute, any split) and oracle-replayed on the TPC-H tables
(`ivm_order_join_delta`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_delta(
    a: DataFrame,
    delta_a: DataFrame,
    b: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str] | str,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """New rows of ``(A ∪ ΔA) ⋈ (B ∪ ΔB)`` relative to ``A ⋈ B``.

    Bag semantics; requires ΔA disjoint from A and ΔB from B (insert-only
    increments). With ``broadcast_deltas`` each term joins a base table
    against a broadcast delta — the base tables are scanned, never
    shuffled.
    """
    on = [on] if isinstance(on, str) else list(on)
    bd = F.broadcast if broadcast_deltas else (lambda df: df)
    return (
        bd(delta_a).join(b, on)
        .unionByName(a.join(bd(delta_b), on))
        .unionByName(bd(delta_a).join(bd(delta_b), on))
    )


def maintain_join(
    view: DataFrame,
    a: DataFrame,
    delta_a: DataFrame,
    b: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str] | str,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """The maintained view: ``view ∪ Δ(A ⋈ B)`` — append-only refresh of
    a materialized join without touching the already-materialized rows
    (pair with ``sources.io.write_partitioned`` append or
    ``merge.merge_upsert`` keyed on the join's row identity)."""
    return view.unionByName(
        join_delta(a, delta_a, b, delta_b, on, broadcast_deltas)
    )


# --------------------------------------------------------------------------
# Z-set (signed-multiplicity) maintenance: the general case with deletes
# --------------------------------------------------------------------------

MULT_COL = "_mult"


def as_zset(df: DataFrame, mult: int = 1, mult_col: str = MULT_COL) -> DataFrame:
    """Lift a plain relation to a Z-set: every row weighted ``mult``
    (+1 for inserts, −1 to encode deletions of existing rows)."""
    return df.withColumn(mult_col, F.lit(mult))


def zset_normalize(df: DataFrame, mult_col: str = MULT_COL) -> DataFrame:
    """Canonical form: one row per distinct tuple with net multiplicity,
    zero-weight tuples dropped. groupBy on the tuple — map-side
    combinable, the only shuffle this layer adds."""
    keys = [c for c in df.columns if c != mult_col]
    return (
        df.groupBy(*keys)
        .agg(F.sum(mult_col).alias(mult_col))
        .filter(F.col(mult_col) != 0)
    )


def _zjoin(
    left: DataFrame, right: DataFrame, on: list[str], mult_col: str
) -> DataFrame:
    lm = left.withColumnRenamed(mult_col, "_lm")
    rm = right.withColumnRenamed(mult_col, "_rm")
    return (
        lm.join(rm, on)
        .withColumn(mult_col, F.col("_lm") * F.col("_rm"))
        .drop("_lm", "_rm")
    )


def join_delta_z(
    a: DataFrame,
    delta_a: DataFrame,
    b: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str] | str,
    mult_col: str = MULT_COL,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """The delta rule over Z-sets — handles INSERTS AND DELETES in one
    algebra (the DBSP / differential-dataflow formulation): with deltas
    carrying signed multiplicities (+1 insert, −1 delete),

        Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    with multiplicities MULTIPLIED per joined pair, is exact for any
    mix of changes — a deletion on either side propagates the right
    negative weight to every joined row, no tombstone special-casing.
    ``maintain_join``'s insert-only contract is the mult≡+1 special
    case. Inputs must all carry ``mult_col`` (see ``as_zset``); the
    output is un-normalized (call ``zset_normalize`` after applying to
    the view). Same broadcast-the-delta cost model as ``join_delta``.
    """
    on = [on] if isinstance(on, str) else list(on)
    bd = F.broadcast if broadcast_deltas else (lambda df: df)
    return (
        _zjoin(bd(delta_a), b, on, mult_col)
        .unionByName(_zjoin(a, bd(delta_b), on, mult_col))
        .unionByName(_zjoin(bd(delta_a), bd(delta_b), on, mult_col))
    )


def apply_delta_z(
    view: DataFrame, delta: DataFrame, mult_col: str = MULT_COL
) -> DataFrame:
    """Maintained Z-set view: normalize(view ∪ delta). Rows whose net
    multiplicity reaches zero (deleted pairs) vanish."""
    return zset_normalize(view.unionByName(delta), mult_col)


def zset_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    mult_col: str = MULT_COL,
) -> DataFrame:
    """Linear aggregates over a Z-set: count = Σ mult and
    sum = Σ mult·value per group — which makes SUM/COUNT views
    maintainable under deletes by simply aggregating the DELTA and
    merging (add counts/sums, drop zero-count groups), the same
    partial-state shape ``operators/rollup.py`` merges for insert-only
    streams. AVG derives as sum/count at read time; MIN/MAX are NOT
    linear (a delete can expose a new extremum) and need their own
    recompute or sketch."""
    return df.groupBy(*group_cols).agg(
        F.sum(F.col(mult_col)).alias("n"),
        F.sum(F.col(mult_col) * F.col(value_col)).alias("total"),
    )


def merge_zset_aggregates(
    view: DataFrame, delta_agg: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Maintained aggregate view: per-group add of (n, total), groups
    whose count reaches zero vanish."""
    return (
        view.unionByName(delta_agg)
        .groupBy(*group_cols)
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        .filter(F.col("n") != 0)
    )
