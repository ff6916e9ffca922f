"""Streaming EWMA: batch parity and replay safety."""

from __future__ import annotations

import time

from commerce_sessionization_spark.operators.timeseries import exp_smooth
from commerce_sessionization_spark.streaming.smooth_stream import exp_smooth_stream

SCHEMA = "event_type string, idx long, x_micro long"
BATCH_1 = [("a", 1, 100), ("a", 2, 200), ("b", 1, 40)]
BATCH_2 = [("a", 3, 0), ("b", 2, 80), ("c", 1, 9)]


def _drive(spark, tmp_path, batches):
    src = tmp_path / "obs_src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"drop_{i}.parquet")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/drop_*.parquet")
    )
    name = f"smooth_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        exp_smooth_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for _ in range(20):
        if not q.isActive:
            break
        time.sleep(0.5)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_matches_batch(spark, tmp_path):
    got = {
        (r.event_type, r.idx): r.s_micro
        for r in _drive(spark, tmp_path, [BATCH_1, BATCH_2]).collect()
    }
    batch = spark.createDataFrame(BATCH_1 + BATCH_2, SCHEMA)
    expected = {
        (r.event_type, r.idx): r.s_micro
        for r in exp_smooth(batch, "event_type").collect()
    }
    assert got == expected and len(got) == 6


def test_replayed_observations_are_dropped(spark, tmp_path):
    # batch 2 re-delivers batch 1's rows (at-least-once upstream):
    # they must neither duplicate output rows nor corrupt the state
    replay = BATCH_1 + [("a", 3, 0)]
    out = _drive(spark, tmp_path, [BATCH_1, replay]).collect()
    keys = [(r.event_type, r.idx) for r in out]
    assert len(keys) == len(set(keys)) == 4
    got = {(r.event_type, r.idx): r.s_micro for r in out}
    # a: s1=100, s2=(200+300)//4=125, s3=(0+375)//4=93 — unaffected by replay
    assert got[("a", 3)] == 93


def _drive_holt(spark, tmp_path, batches):
    from commerce_sessionization_spark.streaming.smooth_stream import (
        holt_smooth_stream,
    )

    src = tmp_path / "holt_src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"drop_{i}.parquet")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/drop_*.parquet")
    )
    name = f"holt_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        holt_smooth_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for _ in range(20):
        if not q.isActive:
            break
        time.sleep(0.5)
    return spark.sql(f"SELECT * FROM {name}")


def test_holt_stream_matches_batch(spark, tmp_path):
    from commerce_sessionization_spark.operators.timeseries import holt_smooth

    # include a falling series so the streaming trend state goes negative
    b1 = [("a", 1, 100), ("a", 2, 200), ("d", 1, 900)]
    b2 = [("a", 3, 400), ("d", 2, 500), ("d", 3, 100)]
    got = {
        (r.event_type, r.idx): (r.s_micro, r.b_micro, r.forecast_micro)
        for r in _drive_holt(spark, tmp_path, [b1, b2]).collect()
    }
    batch = spark.createDataFrame(b1 + b2, SCHEMA)
    expected = {
        (r.event_type, r.idx): (r.s_micro, r.b_micro, r.forecast_micro)
        for r in holt_smooth(batch, "event_type").collect()
    }
    assert got == expected and len(got) == 6
    assert any(v[1] < 0 for v in got.values())


def test_holt_stream_replay_is_idempotent(spark, tmp_path):
    from commerce_sessionization_spark.operators.timeseries import holt_smooth

    b1 = [("a", 1, 100), ("a", 2, 200)]
    replay = [("a", 1, 100), ("a", 2, 200), ("a", 3, 50)]  # 1,2 re-delivered
    got = {
        (r.event_type, r.idx): (r.s_micro, r.b_micro)
        for r in _drive_holt(spark, tmp_path, [b1, replay]).collect()
    }
    batch = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 200), ("a", 3, 50)], SCHEMA
    )
    expected = {
        (r.event_type, r.idx): (r.s_micro, r.b_micro)
        for r in holt_smooth(batch, "event_type").collect()
    }
    assert got == expected and len(got) == 3
