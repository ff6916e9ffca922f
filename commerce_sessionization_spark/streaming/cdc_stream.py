"""Streaming MERGE INTO: maintain an upsert snapshot from a change stream.

The streaming face of ``operators/merge.py``. State rows keep the change
metadata — sequence column and delete flag — so the state is an
LSM-style *tombstone table*: the last version of every key ever seen,
deleted or not. That makes the merge a pure ``collapse_batch`` over
(previous state ∪ batch), which is associative and commutative under the
(seq, tiebreak) total order — exactly the algebra the MVCC-by-epoch
maintainer (``rollup_stream.make_incremental_writer``) requires for
crash/replay idempotency. Consequences, all tested:

- replaying an epoch rewrites the same state version (exactly-once);
- a late change with a LOWER sequence than the state's cannot regress a
  newer write — ordering is by the CDC sequence, not arrival;
- ``read_cdc_snapshot`` resolves the live snapshot by filtering
  tombstones off the latest committed version.

100 TB split: this maintainer rewrites the full key-grain state each
epoch, which is the right cost for dimension-sized state (users,
products — the usual CDC targets). For a fact-sized snapshot, use the
batch path — ``collapse_batch`` + ``merge_upsert`` + partition-aligned
dynamic overwrite — on a schedule; the two share the same collapse
semantics, so the cutover changes durability mechanics, not results.
Tombstones persist (a key's delete must outlive stragglers); compact by
age through the batch path when the straggler horizon passes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.merge import collapse_batch
from commerce_sessionization_spark.streaming.rollup_stream import (
    make_incremental_writer,
    read_rollup_state,
)


def make_cdc_writer(
    spark: SparkSession,
    out_path: str,
    keys: Sequence[str],
    seq_col: str,
    tiebreak: Sequence[str] = (),
    keep_versions: int = 3,
):
    """Idempotent ``foreachBatch`` fn folding change rows into the state.

    Batch rows must carry the key columns, ``seq_col``, the payload, and
    a boolean delete flag (kept in-state as the tombstone marker).
    """
    return make_incremental_writer(
        spark,
        out_path,
        lambda df: collapse_batch(df, keys, seq_col, tiebreak=tiebreak),
        lambda a, b: collapse_batch(
            a.unionByName(b), keys, seq_col, tiebreak=tiebreak
        ),
        keep_versions=keep_versions,
    )


def read_cdc_snapshot(
    spark: SparkSession,
    out_path: str,
    delete_col: str = "_deleted",
) -> DataFrame | None:
    """Live snapshot: latest committed state minus tombstones and
    change metadata. ``None`` before the first commit."""
    state = read_rollup_state(spark, out_path)
    if state is None:
        return None
    return state.filter(
        ~F.coalesce(F.col(delete_col), F.lit(False))
    ).drop(delete_col)
