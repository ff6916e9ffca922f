"""Iterative graph operators (north-star surface).

Connected components (min-label propagation with pointer jumping) lives in
``operators/dedup.py`` next to its near-dup use case; this module holds
the general iterative-computation pattern: a driver-side loop over a
bounded iteration count where each round is one join + one aggregation,
exactly how GraphX/Pregel lowers to dataframes.

Two arithmetic modes (round-3 split, prescribed by the round-2 review):

- ``exact=False`` (default — the scale path): plain ``double`` sums.
  Several× cheaper than decimal aggregation at 100 TB; results are
  deterministic for a fixed partitioning but not order-independent, so
  they can drift in the last ulps between engines/runs.
- ``exact=True`` (the oracle mode): floating-point addition is
  order-dependent, so a naive ``sum(contrib)`` would differ between
  engines — and between *runs* — once partitioning changes. Every sum
  casts its addends to ``DECIMAL(38, 18)`` first: each addend is a
  deterministic double (same IEEE ops in any engine), decimal addition
  is exact and therefore order-independent, and one final cast returns
  to double. The DuckDB oracle replays the identical arithmetic, so a
  5-iteration PageRank is hash-comparable bit-for-bit.

The two modes agree to ~1e-12 per rank (asserted in
``tests/test_graph.py``); only the aggregation buffer type differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dec(col: F.Column) -> F.Column:
    return col.cast("decimal(38,18)")


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    exact: bool = False,
) -> DataFrame:
    """Fixed-iteration power-method PageRank.

    ``edges`` is directed (symmetrize upstream for an undirected graph);
    ``vertices`` must contain every node, including isolated ones. Returns
    ``(node, rank)`` after ``iterations`` rounds of

        rank'(v) = (1-d)/N + d · (Σ_{u→v} rank(u)/outdeg(u) + dangling/N)

    where ``dangling`` is the rank mass parked on out-degree-0 nodes,
    redistributed uniformly (the standard stochastic-matrix patch).

    Scale shape: per iteration ONE join of the rank table against the
    edge list (both keyed on the source node — co-partitioned after the
    first round, so subsequent shuffles reuse the layout) and one
    aggregation by destination; the dangling mass is a scalar, carried by
    a broadcast crossJoin, and the iteration count is a bounded constant.
    No per-vertex driver state — the driver loop only rebinds DataFrames
    (cf. Lloyd's k-means in ``operators/similarity.py``, which does hold
    k×dim centroids driver-side; here even that is avoided). Each round
    ``localCheckpoint``s the new rank table so the lineage — and with it
    the replayed-plan depth — stays O(1) instead of O(iterations).

    ``exact=True`` switches the two per-round sums to order-independent
    decimal accumulation for bit-exact cross-engine replay (see module
    docstring); leave it off on the scale path.
    """
    if exact:
        def _sum(col: F.Column) -> F.Column:
            return F.sum(_dec(col)).cast("double")

        def _sum0(col: F.Column) -> F.Column:
            return (
                F.coalesce(F.sum(_dec(col)), F.lit(0).cast("decimal(38,18)"))
                .cast("double")
            )
    else:
        def _sum(col: F.Column) -> F.Column:
            return F.sum(col)

        def _sum0(col: F.Column) -> F.Column:
            return F.coalesce(F.sum(col), F.lit(0.0))

    n_vert = vertices.count()  # scalar dimension, like k-means' k
    src = F.col(src_col)

    # pin the edge list ONCE: it is referenced every iteration, and without
    # this its entire upstream lineage (often an expensive pair-generation
    # subtree, e.g. the Jaccard self-join feeding the near-dup graph) would
    # re-execute per round — measured 36.7 s → ~8 s at sf0.1 for 5 rounds
    edges = edges.localCheckpoint()
    vertices = vertices.localCheckpoint()
    out_deg = edges.groupBy(src.alias(id_col)).agg(
        F.count(F.lit(1)).alias("_outdeg")
    ).localCheckpoint()
    base = F.lit((1.0 - damping) / n_vert)

    ranks = vertices.select(
        F.col(id_col), F.lit(1.0 / n_vert).alias("rank")
    ).localCheckpoint()

    for _ in range(iterations):
        with_deg = ranks.join(out_deg, id_col, "left")
        dangling = with_deg.filter(F.col("_outdeg").isNull()).agg(
            _sum0(F.col("rank")).alias("_dangling")
        )
        contribs = (
            with_deg.filter(F.col("_outdeg").isNotNull())
            .join(edges, F.col(id_col) == src)
            .select(
                F.col(dst_col).alias(id_col),
                (F.col("rank") / F.col("_outdeg")).alias("_c"),
            )
            .groupBy(id_col)
            .agg(_sum(F.col("_c")).alias("_in"))
        )
        ranks = (
            vertices.select(id_col)
            .join(contribs, id_col, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                F.col(id_col),
                (
                    base
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.col("_dangling") / n_vert
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
