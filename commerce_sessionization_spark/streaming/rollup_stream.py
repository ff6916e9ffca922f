"""Streaming continuous aggregate: fold each micro-batch into a persistent
time-bucket rollup table, exactly-once.

The streaming face of ``operators.rollup``: the batch operator's merge law
(``merge(state, rollup(batch)) == rollup(all events so far)``) is what
makes incremental view maintenance correct; this module makes it *durable*
under crash/replay.

Idempotency is MVCC-by-epoch, not in-place mutation: epoch ``e`` writes a
complete new state version ``{out}/rollup_state/v=e`` computed from the
latest version *older than e* plus the batch — so replaying an epoch
(foreachBatch re-delivery after a checkpoint-commit crash) recomputes the
SAME version from the SAME inputs and overwrites it, instead of
double-counting into a shared table. A version is live only once its
``_SUCCESS`` marker exists (parquet commit protocol); readers resolve
``max(version with _SUCCESS)``. State size is O(buckets × keys) rows, so
rewriting a full version per epoch is metadata-cheap — the events
themselves are never re-read.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from commerce_sessionization_spark.operators.rollup import (
    merge_rollups,
    time_bucket_rollup,
)
from commerce_sessionization_spark.streaming.pipeline import _fs_and_path, _glob

_VERSION_RE = re.compile(r"/v=(\d+)$")


def _live_versions(spark: SparkSession, state_root: str) -> list[int]:
    fs, jvm = _fs_and_path(spark, state_root)
    out = []
    for st in _glob(fs, jvm, f"{state_root}/v=*/_SUCCESS"):
        m = _VERSION_RE.search(str(st.getPath().getParent().toString()))
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_rollup_state(
    spark: SparkSession, out_path: str, before: int | None = None
) -> DataFrame | None:
    """Latest committed rollup version (optionally: latest OLDER than
    ``before``, which is what an epoch replay must read). None if empty."""
    state_root = f"{out_path}/rollup_state"
    versions = _live_versions(spark, state_root)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    return spark.read.parquet(f"{state_root}/v={versions[-1]}")


def make_rollup_writer(
    spark: SparkSession,
    out_path: str,
    keys: Sequence[str] = ("event_type",),
    bucket: str = "hour",
    keep_versions: int = 3,
):
    """Build the idempotent ``foreachBatch`` fn maintaining the rollup.

    Public so tests can drive epochs directly and assert replay safety.
    Old committed versions beyond ``keep_versions`` are pruned AFTER the
    new version commits (a crash mid-prune leaves extra versions, never
    missing ones).
    """
    state_root = f"{out_path}/rollup_state"

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        partial = time_bucket_rollup(batch_df, keys=tuple(keys), bucket=bucket)
        prev = read_rollup_state(spark, out_path, before=epoch_id)
        merged = (
            partial
            if prev is None
            else merge_rollups(prev, partial, keys=tuple(keys))
        )
        # overwrite => replaying this epoch rewrites the same version
        merged.write.mode("overwrite").parquet(f"{state_root}/v={epoch_id}")
        live = _live_versions(spark, state_root)
        fs, jvm = _fs_and_path(spark, state_root)
        for v in live[:-keep_versions] if keep_versions else []:
            if v != epoch_id:
                fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_root}/v={v}"), True)

    return write


def rollup_stream(
    events: DataFrame,
    spark: SparkSession,
    out_path: str,
    checkpoint: str,
    keys: Sequence[str] = ("event_type",),
    bucket: str = "hour",
):
    """Wire a streaming events frame into the rollup maintainer."""
    return (
        events.writeStream.foreachBatch(make_rollup_writer(spark, out_path, keys, bucket))
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
