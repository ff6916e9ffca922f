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
