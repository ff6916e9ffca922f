"""Custom Python data source (Spark 4 DataSource API): a deterministic
commerce-events generator.

Registered as format ``"commerce_events"``, this is the engine's
synthetic-load source for demos, streaming smoke tests, and bench
warmups — a domain-shaped cousin of the built-in ``rate`` source:

    spark.dataSource.register(CommerceEventsDataSource)
    df = (spark.read.format("commerce_events")
          .option("rows", 100_000).option("partitions", 32)
          .option("seed", "r3").load())

Design points (this is also the reference implementation for writing
NEW sources against the engine):

- **Partition-parallel and deterministic.** ``partitions()`` splits the
  row range into ``partitions`` disjoint slices; each slice derives its
  rows from a SplitMix64 of (seed, absolute row index) — no RNG state,
  so the dataset is a pure function of (rows, partitions, seed) and
  identical across retries, executors, partitionings, and runs
  (speculative tasks can't diverge). The scalar reference (``_row``)
  and the vectorized path are pinned equal by pytest.
- **Arrow-batched, vectorized generation.** The batch reader yields
  pyarrow ``RecordBatch``es built from numpy uint64 arithmetic — no
  per-row Python in the hot path (the DataSource API's fast lane; a
  per-row tuple generator is ~50× slower at 10M rows). Generation
  happens ON the executors: the driver ships only (start, end, seed).
- **Streaming too.** ``simpleStreamReader`` exposes the same rows as an
  unbounded stream paced by ``rows_per_batch``, with offsets = absolute
  row indices, so exactly-once sinks can replay a batch after a crash
  and get byte-identical rows (the property the streaming tests pin).

The event shape matches the ``events`` testdata table: (event_id, ts,
user_id, event_type, value) with a Zipf-ish user skew (user ids drawn
from a squared uniform) so sessionization demos see realistic hot keys.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_EVENT_TYPES = ("view", "cart", "purchase", "remove_from_cart")
_BASE_TS = 1_569_888_000  # 2019-10-01 00:00:00 UTC, the testdata epoch
_MASK = (1 << 64) - 1
_ARROW_CHUNK = 65_536


def _schema() -> StructType:
    return StructType(
        [
            StructField("event_id", LongType(), False),
            StructField("ts", TimestampType(), False),
            StructField("user_id", LongType(), False),
            StructField("event_type", StringType(), False),
            StructField("value", DoubleType(), False),
        ]
    )


def _seed64(seed: str) -> int:
    return int(hashlib.sha256(seed.encode()).hexdigest()[:16], 16)


def _splitmix64(x: int) -> int:
    """Scalar reference; the numpy path below must match bit-for-bit."""
    z = (x + 0x9E3779B97F4A7C15) & _MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E9B5) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return z ^ (z >> 31)


def _h(seed: str, i: int) -> int:
    return _splitmix64((_seed64(seed) + i) & _MASK)


def _derive(h: int, n_users: int):
    """Scalar field derivations (mirrored exactly by ``_gen_block``)."""
    u = (h % 1_000_000) / 1_000_000.0
    user_id = int(u * u * n_users)
    ts = _BASE_TS + (h >> 20) % 86_400  # one day of traffic
    etype = _EVENT_TYPES[(h >> 8) % len(_EVENT_TYPES)]
    value = ((h >> 32) % 100_000) / 100.0
    return user_id, ts, etype, value


def _row(seed: str, i: int, n_users: int):
    import datetime as _dt

    user_id, ts, etype, value = _derive(_h(seed, i), n_users)
    return (
        i,
        _dt.datetime.fromtimestamp(ts, _dt.timezone.utc),
        user_id,
        etype,
        value,
    )


def _gen_block(seed: str, start: int, end: int, n_users: int):
    """Vectorized (numpy) twin of ``_row`` over [start, end) → arrays."""
    import numpy as np

    with np.errstate(over="ignore"):  # uint64 wrap is the algorithm
        idx = np.arange(start, end, dtype=np.uint64)
        z = idx + np.uint64(_seed64(seed) & _MASK)
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E9B5)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = z ^ (z >> np.uint64(31))

        u = (h % np.uint64(1_000_000)).astype(np.float64) / 1_000_000.0
        user_id = np.floor(u * u * n_users).astype(np.int64)
        ts = np.int64(_BASE_TS) + (
            (h >> np.uint64(20)) % np.uint64(86_400)
        ).astype(np.int64)
        etype_idx = ((h >> np.uint64(8)) % np.uint64(4)).astype(np.int64)
        value = (
            (h >> np.uint64(32)) % np.uint64(100_000)
        ).astype(np.float64) / 100.0
    return idx.astype(np.int64), ts, user_id, etype_idx, value


def _arrow_batch(seed: str, start: int, end: int, n_users: int):
    import numpy as np
    import pyarrow as pa

    event_id, ts, user_id, etype_idx, value = _gen_block(
        seed, start, end, n_users
    )
    types = np.array(_EVENT_TYPES)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(event_id, type=pa.int64()),
            pa.array(ts * 1_000_000, type=pa.timestamp("us", tz="UTC")),
            pa.array(user_id, type=pa.int64()),
            pa.array(types[etype_idx], type=pa.string()),
            pa.array(value, type=pa.float64()),
        ],
        names=["event_id", "ts", "user_id", "event_type", "value"],
    )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: str, n_users: int):
        self.start, self.end, self.seed, self.n_users = (
            start,
            end,
            seed,
            n_users,
        )


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.nparts = max(1, int(options.get("partitions", 8)))
        self.seed = str(options.get("seed", "gen"))
        self.n_users = int(options.get("users", 1000))

    def partitions(self) -> Sequence[InputPartition]:
        if self.rows <= 0:  # empty dataset, not range(0, 0, 0)
            return []
        step = -(-self.rows // self.nparts)  # ceil
        return [
            _Slice(s, min(s + step, self.rows), self.seed, self.n_users)
            for s in range(0, self.rows, step)
        ]

    def read(self, partition: _Slice) -> Iterator:
        for s in range(partition.start, partition.end, _ARROW_CHUNK):
            yield _arrow_batch(
                partition.seed,
                s,
                min(s + _ARROW_CHUNK, partition.end),
                partition.n_users,
            )


class _StreamReader(SimpleDataSourceStreamReader):
    """Offsets are absolute row indices: batch (a, b] is rows a..b-1.
    Replaying the same offset range regenerates identical rows, which is
    what makes downstream exactly-once sinks testable."""

    def __init__(self, options):
        self.per_batch = int(options.get("rows_per_batch", 100))
        self.seed = str(options.get("seed", "gen"))
        self.n_users = int(options.get("users", 1000))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        a = int(start["index"])
        b = a + self.per_batch
        return (
            iter([_row(self.seed, i, self.n_users) for i in range(a, b)]),
            {"index": b},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                _row(self.seed, i, self.n_users)
                for i in range(int(start["index"]), int(end["index"]))
            ]
        )


class CommerceEventsDataSource(DataSource):
    """``spark.read.format("commerce_events")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "commerce_events"

    def schema(self) -> StructType:
        return _schema()

    def reader(self, schema: StructType) -> DataSourceReader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CommerceEventsDataSource)
