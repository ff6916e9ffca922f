"""Custom Python DataSource (commerce_events): partition planning,
determinism, skew shape, and streaming offset-replay semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from commerce_sessionization_spark.sources.generator import (
    CommerceEventsDataSource,
    _row,
    register,
)


def _load(spark, **opts):
    register(spark)
    r = spark.read.format("commerce_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_rowcount_and_partition_planning(spark):
    df = _load(spark, rows=10_000, partitions=8, seed="t")
    assert df.count() == 10_000
    assert df.rdd.getNumPartitions() == 8
    # uneven split still covers the exact range
    df2 = _load(spark, rows=10_001, partitions=8, seed="t")
    assert df2.count() == 10_001
    ids = df2.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    assert tuple(ids) == (0, 10_000)


def test_rows_are_pure_function_of_seed_not_partitioning(spark):
    a = sorted(map(tuple, _load(spark, rows=500, partitions=7, seed="s").collect()))
    b = sorted(map(tuple, _load(spark, rows=500, partitions=3, seed="s").collect()))
    assert a == b
    c = sorted(map(tuple, _load(spark, rows=500, partitions=3, seed="s2").collect()))
    assert a != c


def test_event_shape_and_user_skew(spark):
    df = _load(spark, rows=20_000, partitions=8, seed="t", users=1000)
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value"]
    assert df.filter(F.col("event_type").isin(
        "view", "cart", "purchase", "remove_from_cart")).count() == 20_000
    # squared-uniform draw: the bottom half of the id space carries
    # ~sqrt(0.5)=71% of events (Zipf-ish hot keys for skew demos)
    low = df.filter(F.col("user_id") < 500).count() / 20_000
    assert 0.65 < low < 0.76


def test_stream_reader_offsets_replay_identically(spark):
    """(a, b] offset ranges regenerate byte-identical rows — the property
    exactly-once sinks rely on when a crashed batch replays."""
    reader = CommerceEventsDataSource(
        {"rows_per_batch": "50", "seed": "st", "users": "100"}
    ).simpleStreamReader(None)
    assert reader.initialOffset() == {"index": 0}
    rows1, off1 = reader.read({"index": 0})
    rows1 = list(rows1)
    assert off1 == {"index": 50} and len(rows1) == 50
    replay = list(reader.readBetweenOffsets({"index": 0}, {"index": 50}))
    assert replay == rows1
    assert rows1[0] == _row("st", 0, 100)


def test_streaming_end_to_end_micro_batches(spark, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("commerce_events")
        .option("rows_per_batch", 25)
        .option("seed", "st")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("gen_stream")
        .trigger(processingTime="0 seconds")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        # the source is unbounded — processAllAvailable() would never
        # return; wait for at least one committed micro-batch instead
        import time

        deadline = time.time() + 60
        while (
            spark.table("gen_stream").count() < 25
            and time.time() < deadline
        ):
            time.sleep(0.5)
        n1 = spark.table("gen_stream").count()
        assert n1 >= 25
        got = [
            tuple(r)
            for r in spark.table("gen_stream")
            .orderBy("event_id")
            .limit(25)
            .collect()
        ]
        # collect() renders session-UTC timestamps tz-naive; compare in UTC
        want = [
            (i0, ts.replace(tzinfo=None), u, e, v)
            for (i0, ts, u, e, v) in (_row("st", i, 1000) for i in range(25))
        ]
        assert got == want
    finally:
        q.stop()


def test_vectorized_block_matches_scalar_reference(spark):
    """The Arrow fast path and the scalar _row reference must agree
    bit-for-bit — the contract that makes batch/stream outputs one
    dataset."""
    from commerce_sessionization_spark.sources.generator import (
        _gen_block,
        _row,
    )

    event_id, ts, user_id, etype_idx, value = _gen_block("x", 100, 400, 777)
    types = ("view", "cart", "purchase", "remove_from_cart")
    for j, i in enumerate(range(100, 400)):
        rid, rts, ruser, retype, rvalue = _row("x", i, 777)
        assert event_id[j] == rid
        assert ts[j] == int(rts.timestamp())
        assert user_id[j] == ruser
        assert types[etype_idx[j]] == retype
        assert value[j] == rvalue


def test_batch_read_equals_scalar_rows_via_spark(spark):
    from commerce_sessionization_spark.sources.generator import _row

    df = _load(spark, rows=300, partitions=5, seed="vv", users=50)
    got = [
        (r.event_id, r.ts.replace(tzinfo=None), r.user_id, r.event_type,
         r.value)
        for r in df.orderBy("event_id").collect()
    ]
    want = [
        (i0, ts.replace(tzinfo=None), u, e, v)
        for (i0, ts, u, e, v) in (_row("vv", i, 50) for i in range(300))
    ]
    assert got == want
