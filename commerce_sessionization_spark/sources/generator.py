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
  row range into ``partitions`` disjoint slices; each slice generates
  its rows from ``sha256(seed:index)`` — no RNG state, so the dataset
  is a pure function of (rows, partitions, seed) and identical across
  retries, executors, and runs (speculative tasks can't diverge).
- **Generation happens ON the executors.** The driver ships only
  (start, end, seed) per partition; a 10-billion-row load is 10 billion
  rows generated in parallel, never a driver-side list.
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


def _h(seed: str, i: int) -> int:
    """60-bit deterministic hash of (seed, row index)."""
    return int(
        hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()[:15], 16
    )


def _row(seed: str, i: int, n_users: int):
    import datetime as _dt

    h = _h(seed, i)
    # squared-uniform user draw ⇒ low ids are hot (Zipf-ish skew)
    u = (h % 1_000_000) / 1_000_000.0
    user_id = int(u * u * n_users)
    ts = _BASE_TS + (h >> 20) % 86_400  # one day of traffic
    etype = _EVENT_TYPES[(h >> 8) % len(_EVENT_TYPES)]
    value = ((h >> 32) % 100_000) / 100.0
    return (
        i,
        _dt.datetime.fromtimestamp(ts, _dt.timezone.utc),
        user_id,
        etype,
        value,
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
        step = -(-self.rows // self.nparts)  # ceil
        return [
            _Slice(s, min(s + step, self.rows), self.seed, self.n_users)
            for s in range(0, self.rows, step)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i, partition.n_users)


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
