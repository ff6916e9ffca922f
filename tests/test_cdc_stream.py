"""Streaming CDC upsert state: MERGE semantics across epochs, replay
idempotency, and sequence-ordered (not arrival-ordered) conflict wins."""

from __future__ import annotations

from pyspark.sql import Row

from commerce_sessionization_spark.streaming.cdc_stream import (
    make_cdc_writer,
    read_cdc_snapshot,
)


def _chg(k, name, bal, seq, deleted=False):
    return Row(k=k, name=name, bal=bal, seq=seq, _deleted=deleted)


def _snap(spark, out):
    df = read_cdc_snapshot(spark, out)
    return {
        (r.k, r.name, r.bal) for r in df.select("k", "name", "bal").collect()
    }


def test_cdc_stream_merge_across_epochs(spark, tmp_path):
    out = str(tmp_path / "cdc")
    write = make_cdc_writer(spark, out, ["k"], "seq")
    write(
        spark.createDataFrame(
            [_chg(1, "a", 10.0, 1), _chg(2, "b", 20.0, 1)]
        ),
        epoch_id=1,
    )
    assert _snap(spark, out) == {(1, "a", 10.0), (2, "b", 20.0)}
    # epoch 2: update k=1, delete k=2, insert k=3
    write(
        spark.createDataFrame(
            [
                _chg(1, "a2", 11.0, 2),
                _chg(2, "b", 20.0, 2, deleted=True),
                _chg(3, "c", 30.0, 2),
            ]
        ),
        epoch_id=2,
    )
    assert _snap(spark, out) == {(1, "a2", 11.0), (3, "c", 30.0)}


def test_cdc_epoch_replay_rewrites_same_snapshot(spark, tmp_path):
    out = str(tmp_path / "cdc")
    write = make_cdc_writer(spark, out, ["k"], "seq")
    write(spark.createDataFrame([_chg(1, "a", 10.0, 1)]), epoch_id=1)
    batch2 = [_chg(1, "a2", 11.0, 2), _chg(2, "b", 20.0, 2)]
    write(spark.createDataFrame(batch2), epoch_id=2)
    before = _snap(spark, out)
    # crash after write, before checkpoint commit ⇒ epoch 2 re-delivered
    write(spark.createDataFrame(batch2), epoch_id=2)
    assert _snap(spark, out) == before == {(1, "a2", 11.0), (2, "b", 20.0)}


def test_cdc_lower_seq_straggler_cannot_regress_state(spark, tmp_path):
    """Ordering is the CDC sequence, not arrival: a late epoch carrying an
    OLDER version of a key leaves the newer state row in place."""
    out = str(tmp_path / "cdc")
    write = make_cdc_writer(spark, out, ["k"], "seq")
    write(spark.createDataFrame([_chg(1, "new", 99.0, 5)]), epoch_id=1)
    write(spark.createDataFrame([_chg(1, "stale", 1.0, 3)]), epoch_id=2)
    assert _snap(spark, out) == {(1, "new", 99.0)}


def test_cdc_delete_tombstone_survives_replayed_stale_upsert(spark, tmp_path):
    out = str(tmp_path / "cdc")
    write = make_cdc_writer(spark, out, ["k"], "seq")
    write(spark.createDataFrame([_chg(1, "a", 10.0, 1)]), epoch_id=1)
    write(
        spark.createDataFrame([_chg(1, "a", 10.0, 7, deleted=True)]),
        epoch_id=2,
    )
    # straggler re-sends the seq=1 insert after the seq=7 delete
    write(spark.createDataFrame([_chg(1, "a", 10.0, 1)]), epoch_id=3)
    assert _snap(spark, out) == set()


def test_cdc_snapshot_none_before_first_commit(spark, tmp_path):
    assert read_cdc_snapshot(spark, str(tmp_path / "nope")) is None


def test_cdc_end_to_end_real_stream(spark, tmp_path):
    """Close the loop: parquet change-drops → readStream → foreachBatch
    (make_cdc_writer) → read_cdc_snapshot, one micro-batch per drop."""
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("k", IntegerType()),
            StructField("name", StringType()),
            StructField("bal", DoubleType()),
            StructField("seq", IntegerType()),
            StructField("_deleted", BooleanType()),
        ]
    )
    drops = [
        [(1, "a", 10.0, 1, False), (2, "b", 20.0, 1, False)],
        [(1, "a2", 11.0, 2, False), (2, "b", 20.0, 2, True),
         (3, "c", 30.0, 2, False)],
    ]
    src = tmp_path / "cdc_src"
    src.mkdir()
    for i, rows in enumerate(drops):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"drop_{i}.parquet")
        )
    out = str(tmp_path / "cdc_state")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/drop_*.parquet")
    )
    q = (
        stream.writeStream.foreachBatch(make_cdc_writer(spark, out, ["k"], "seq"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snap = {
        (r.k, r.name, r.bal)
        for r in read_cdc_snapshot(spark, out).select("k", "name", "bal").collect()
    }
    assert snap == {(1, "a2", 11.0), (3, "c", 30.0)}
