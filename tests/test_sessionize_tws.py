"""transformWithState (v2) sessionizer: plan construction always; the
execution parity run needs protobuf (the v2 state-server protocol),
absent in this container — see the module docstring."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from commerce_sessionization_spark.streaming.sessionize_tws import (
    SessionProcessor,
    _mint_id,
    sessionize_stream_tws,
)


def _rate_events(spark):
    return (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 10).alias("user_id"),
        )
    )


def test_tws_builds_streaming_plan(spark):
    out = sessionize_stream_tws(_rate_events(spark))
    assert out.isStreaming
    assert out.columns == ["event_id", "ts", "user_id", "session_id"]


def test_tws_mints_same_ids_as_batch_formula(spark):
    from commerce_sessionization_spark.operators.sessions import sessionize

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00")],
        "user_id long, s string",
    ).select("user_id", F.to_timestamp("s").alias("ts"))
    batch_ids = {r.session_id for r in sessionize(df).collect()}
    start_us = 1_704_103_200_000_000  # 2024-01-01 10:00:00 UTC in micros
    assert batch_ids == {_mint_id(1, start_us)}


def test_tws_processor_logic_offline(spark):
    """Drive the processor's pandas path directly with a stub handle —
    the session arithmetic must match v1 without running a stream."""
    import pandas as pd

    class _StubState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

        def clear(self):
            self.v = None

    class _StubHandle:
        def __init__(self):
            self.state = _StubState()
            self.timers = []

        def getValueState(self, name, schema):
            return self.state

        def listTimers(self):
            return list(self.timers)

        def deleteTimer(self, t):
            self.timers.remove(t)

        def registerTimer(self, t):
            self.timers.append(t)

    class _StubTimers:
        def getCurrentWatermarkInMs(self):
            return 0

    proc = SessionProcessor("ts", 1800 * 1_000_000, ["event_id", "session_id"])
    proc.init(_StubHandle())
    base = pd.Timestamp("2024-01-01 10:00:00")
    batch = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [base, base + pd.Timedelta("10min"),
                   base + pd.Timedelta("50min")],
        }
    )
    (out,) = list(proc.handleInputRows((7,), iter([batch]), _StubTimers()))
    ids = list(out["session_id"])
    assert ids[0] == ids[1] != ids[2]  # 40-min gap splits the session
    start_us = base.value // 1000
    assert ids[0] == _mint_id(7, start_us)
    # a second micro-batch within the gap continues the same session
    batch2 = pd.DataFrame(
        {"event_id": [4], "ts": [base + pd.Timedelta("60min")]}
    )
    (out2,) = list(proc.handleInputRows((7,), iter([batch2]), _StubTimers()))
    assert list(out2["session_id"]) == [ids[2]]
    # exactly one live eviction timer
    assert len(proc._handle.timers) == 1


def test_tws_execution_parity(spark, tmp_path):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState execution needs protobuf (not shipped "
        "in this container)",
    )
    import test_streaming as T
    from commerce_sessionization_spark.operators.sessions import sessionize

    df = T.run_stream(
        spark, tmp_path, sessionize_stream_tws, ["event_id", "session_id"]
    )
    got = {r.event_id: r.session_id for r in df.collect()}
    all_rows = T.BATCH_1 + T.BATCH_2
    expected = {
        r.event_id: r.session_id
        for r in sessionize(
            spark.createDataFrame(all_rows, T.SCHEMA), order_cols=("event_id",)
        ).collect()
    }
    assert len(got) == len(all_rows)
    assert got == expected
