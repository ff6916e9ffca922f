"""Join operators beyond plain equi-joins (SURVEY §2.3 additive surface).

The reference contains zero joins — its one as-of-shaped problem (prev-hour
carry-in) is solved by union + window re-computation
(``SessionizationBuiltIn.scala:54-57``). That union+window trick *is* the
scalable formulation of an as-of join, so ``asof_join`` generalizes it:

    tag both sides → union on (key, time) → one window per key orders the
    merged timeline → ``last(right_payload, ignorenulls)`` carries the most
    recent right row onto each left row → keep left rows.

Cost: ONE shuffle on the key + one sort — the same exchange a plain
sessionization pays. The naive alternative (equi-join on key + inequality
on time + argmax) materializes every (left × earlier-right) pair per key
before pruning; at 100 TB fact sizes that intermediate is the bottleneck,
the merged-timeline window never builds it.

``range_join`` is the declarative equi+interval join: Catalyst pushes the
equality into the join key and evaluates the interval as a post-join
predicate — with AQE handling skew. DuckDB mirrors both natively (ASOF
JOIN / interval predicates), giving exact oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: tuple[str, ...] = (),
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_seconds: int | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """For each left row, attach the closest right row at-or-before (``backward``)
    or at-or-after (``forward``) its ``on`` time, per ``by`` key.

    ``right_cols`` are emitted as ``{right_prefix}{col}`` (NULL when no match
    within ``tolerance_seconds``). Right rows should be unique per
    ``(by, on)`` — pre-aggregate otherwise (ties resolve arbitrarily).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload_fields = [on, *[c for c in right_cols if c != on]]
    r = right.select(
        F.col(by),
        F.col(on),
        F.struct(*[F.col(c) for c in payload_fields]).alias("_rpayload"),
        F.lit(0 if allow_exact_matches else 2).alias("_side"),
    )
    l = left.withColumn("_rpayload", F.lit(None).cast(r.schema["_rpayload"].dataType)) \
            .withColumn("_side", F.lit(1))

    merged = l.unionByName(r, allowMissingColumns=True)
    order = [F.col(on), F.col("_side")]
    if direction == "forward":
        order = [F.col(on).desc(), F.col("_side")]
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn(
        "_match", F.last("_rpayload", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)

    if tolerance_seconds is not None:
        delta = F.unix_micros(F.col(on)) - F.unix_micros(F.col("_match")[on])
        if direction == "forward":
            delta = -delta
        matched = matched.withColumn(
            "_match",
            F.when(delta <= tolerance_seconds * 1_000_000, F.col("_match")),
        )

    out_cols: list[Column] = [left[c] for c in left.columns]
    for c in payload_fields:
        out_cols.append(F.col("_match")[c].alias(f"{right_prefix}{c}"))
    return matched.select(*out_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: semantically identical to
    ``left.join(right, key, how)`` but a hot key's rows spread over
    ``n_salts`` reducers.

    Left rows get a deterministic salt (hash of the whole row mod
    ``n_salts``); the right side replicates once per salt; the join key
    becomes ``(key, salt)``. Use when AQE skew-splitting is unavailable or
    insufficient and the right side is too large to broadcast — the cost is
    ``n_salts×`` the right side's shuffle volume, the win is no single
    straggler reducer owning the hot key. Supports ``inner`` and ``left``
    (right/full would change semantics under replication).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[left[c] for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("_salt", salt.cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, [key, "_salt"], how).drop("_salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    interval: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi+interval join: ``on`` is the equality key condition, ``interval``
    the range predicate (e.g. ``(r.ts >= l.start) & (r.ts < l.end)``).

    Declarative on purpose: Catalyst plans the equality as the shuffle key
    and the interval as a join-time filter, so the join never degenerates to
    a cross product; AQE splits skewed keys.
    """
    return left.join(right, on & interval, how)


def bloom_filtered_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    m: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Equi-join with a bloom-filter pre-prune of the probe side.

    Builds a bloom filter of ``right``'s distinct keys (``sketches.
    bloom_bits`` — a ≤ m-row position set), collapses it to a 1-row
    broadcast lookup map, and filters ``left`` BEFORE the join: rows
    whose key cannot be on the right never enter the shuffle. False
    positives pass the filter and are dropped by the real join, so the
    result is bit-identical to ``left.join(right, key, how)`` — the
    filter only moves bytes off the exchange.

    This is the manual form of runtime row-group/bloom pruning for the
    regime Spark's broadcast join can't reach: ``right`` too LARGE to
    broadcast as rows, but its key fingerprint (m bits) still tiny. At
    100 TB, a selective dimension predicate shrinks the fact-side
    shuffle by the join selectivity — the same motivation as Spark's
    own `spark.sql.optimizer.runtime.bloomFilter`, expressed as a
    composable operator with a deterministic (SHA-derived, replayable)
    filter. Probe cost is k hash + k map lookups per row, inside
    codegen; no shuffle is added anywhere.

    Supports ``inner`` and ``left_semi`` (prune-then-join preserves
    them; outer joins would lose left rows at the filter).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom_filtered_join supports inner|left_semi, got {how!r}")
    bitmap = _bloom_words(right, key, m, k)
    pruned = (
        left.crossJoin(F.broadcast(bitmap))
        .filter(
            F.forall(
                _probe_positions(F.col(key), m, k),
                lambda p: (
                    F.element_at(F.col("_bw"), (p / 32).cast("int") + 1)
                    .bitwiseAND(F.pow(F.lit(2.0), (p % 32).cast("int")).cast("long"))
                    != 0
                ),
            )
        )
        .drop("_bw")
    )
    return pruned.join(right, key, how)


def _probe_positions(key: Column, m: int, k: int) -> Column:
    """k bloom positions from native xxhash64 (one JVM hash per probe —
    the filter is internal to the join, so unlike the oracle-replayable
    ``sketches.bloom_bits`` it doesn't need SHA determinism across
    engines, just consistency between build and probe)."""
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(k)]
    )


def _bloom_words(df: DataFrame, key: str, m: int, k: int) -> DataFrame:
    """1-row DataFrame holding the filter as a DENSE array of m/32
    packed 32-bit words (32, not 64: the probe reconstructs the bit as
    pow(2, p%32) cast to long — exact in double and overflow-free,
    where 2^63 is not) — ``element_at`` by index is O(1), where the
    naive map-of-positions lookup is a linear scan of the key array
    (measured: 8192-entry map × 3 probes/row turned a 2 s query into
    18 s of pure lookup time)."""
    n_words = (m + 31) // 32
    pos = F.explode(_probe_positions(F.col(key), m, k)).alias("pos")
    words = (
        df.select(F.col(key)).distinct()
        .select(pos)
        .select(
            (F.col("pos") / 32).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .agg(
            F.map_from_arrays(
                F.collect_list("w"), F.collect_list("word")
            ).alias("_m")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0).cast("long")),
            ).alias("_bw")
        )
    )
    return words
