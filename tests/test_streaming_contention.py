"""Concurrent-epoch replay: the round-2 verdict's streaming stress item.

Two OVERLAPPING restarts of the foreachBatch pipeline (zombie driver +
replacement) can race the same epoch. The writer's lock-file fence must
serialize them — exactly one attempt commits, the loser no-ops on the
winner's marker — and recover from the two crash shapes a fence
introduces: a stale lock left by a dead holder, and a live lock that
never commits.

These tests drive the REAL races against the real writer on file://,
where the fence primitive (``pipeline._try_lock``) is O_EXCL — the same
atomicity contract class as HDFS's create(overwrite=false).
"""

from __future__ import annotations

import glob
import os
import threading
import time

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from commerce_sessionization_spark.streaming.pipeline import (
    EpochContendedError,
    make_epoch_writer,
)

from datetime import datetime

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)

ROWS = [
    (i, 100 + i % 3, datetime(2023, 11, 14, 10, 0, i)) for i in range(30)
]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "session_id", F.sha2(F.concat_ws("-", "user_id"), 256)
    )


def _read_ids(spark, out):
    return sorted(
        r.event_id for r in spark.read.parquet(f"{out}/sessions").collect()
    )


def test_two_simultaneous_writers_commit_exactly_once(spark, tmp_path):
    """Race two attempts of the SAME epoch from a shared start barrier:
    whichever takes the lock commits; the other must no-op (waiting out
    the winner via the marker), never raise, and never duplicate."""
    out = str(tmp_path / "out")
    write = make_epoch_writer(spark, out, contend_wait_sec=120.0)
    df = _df(spark)

    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def attempt():
        barrier.wait()
        try:
            write(df, 7)
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(e)

    threads = [threading.Thread(target=attempt) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    # exactly once: every row exactly one time
    assert _read_ids(spark, out) == sorted(r[0] for r in ROWS)
    # exactly one commit marker, no leaked locks, no leftover staging
    assert sorted(e for e in os.listdir(f"{out}/_epochs")
                  if not e.startswith(".")) == ["7"]
    assert glob.glob(f"{out}/_staging/*") == []
    # every data file belongs to epoch 7 (no unfenced strays)
    for f in glob.glob(f"{out}/sessions/*/*/*.parquet"):
        assert os.path.basename(f).startswith("e7-")


def test_stale_lock_from_dead_holder_is_stolen(spark, tmp_path):
    """Zombie crash shape: the previous holder died HOLDING the lock
    (no marker, possibly partial renames). A new attempt must steal the
    stale lock, clean the epoch's debris, and commit exactly once."""
    out = str(tmp_path / "out")
    df = _df(spark)

    # first, a half-finished attempt: real files but no marker, plus a
    # lock whose holder is gone (mtime pushed past the lease)
    bootstrap = make_epoch_writer(spark, out)
    bootstrap(df, 3)
    os.remove(f"{out}/_epochs/3")  # un-commit: now it's a crashed attempt
    lock = f"{out}/_epochs/3.lock"
    open(lock, "w").close()
    stale = time.time() - 3600
    os.utime(lock, (stale, stale))

    write = make_epoch_writer(spark, out, lock_lease_sec=60.0)
    write(df, 3)  # must steal, repair, commit — not wait, not duplicate
    assert _read_ids(spark, out) == sorted(r[0] for r in ROWS)
    assert sorted(e for e in os.listdir(f"{out}/_epochs")
                  if not e.startswith(".")) == ["3"]


def test_live_lock_without_commit_times_out(spark, tmp_path):
    """A lock inside its lease with no marker means a writer may be
    mid-flight: the contender must neither write around the fence nor
    hang forever — it raises EpochContendedError and leaves no trace."""
    out = str(tmp_path / "out")
    os.makedirs(f"{out}/_epochs")
    open(f"{out}/_epochs/5.lock", "w").close()  # fresh → inside lease

    write = make_epoch_writer(
        spark, out, lock_lease_sec=3600.0, contend_wait_sec=2.0, poll_sec=0.1
    )
    with pytest.raises(EpochContendedError):
        write(_df(spark), 5)
    assert not os.path.exists(f"{out}/_epochs/5")      # no marker
    assert not os.path.exists(f"{out}/sessions")        # no data written
    assert os.path.exists(f"{out}/_epochs/5.lock")      # fence untouched


def test_loser_waiting_on_live_winner_sees_marker_and_noops(spark, tmp_path):
    """Serialization, not failure: while a winner is mid-commit the
    contender polls; once the marker lands the loser returns cleanly."""
    out = str(tmp_path / "out")
    df = _df(spark)
    write = make_epoch_writer(spark, out, contend_wait_sec=120.0)

    lock = f"{out}/_epochs/9.lock"
    os.makedirs(f"{out}/_epochs")
    open(lock, "w").close()  # hold the fence, as a live winner would

    done: list[float] = []

    def contender():
        write(df, 9)
        done.append(time.time())

    t = threading.Thread(target=contender)
    t.start()
    time.sleep(1.0)
    assert not done  # still fenced out
    # winner finishes: commit the epoch for real, then release the fence
    winner = make_epoch_writer(spark, out)
    os.remove(lock)
    winner(df, 9)
    t.join(timeout=300)
    assert done  # loser returned
    assert _read_ids(spark, out) == sorted(r[0] for r in ROWS)
    assert sorted(e for e in os.listdir(f"{out}/_epochs")
                  if not e.startswith(".")) == ["9"]
