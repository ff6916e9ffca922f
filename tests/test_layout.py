"""Z-order layout: locality + file-skipping proofs on real footer stats.

The point of z-ordering is measurable without a cluster: after a
z-ordered write, each parquet file's min/max footer range on EVERY
clustered column is a fraction of the global range, so a conjunctive
predicate selects few files. A naive (unclustered) write leaves each
file spanning ~the full range of at least one column.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from pyspark.sql import Row

from commerce_sessionization_spark.operators.layout import (
    write_zordered,
    zorder_key,
)

N = 4096
FILES = 16


@pytest.fixture(scope="module")
def grid(spark):
    # deterministic 2-D grid walk: x and y decorrelated, full range each
    rows = [Row(rid=i, x=(i * 37) % N, y=(i * 101) % N) for i in range(N)]
    return spark.createDataFrame(rows)


def _file_spans(path: str, col: str) -> list[tuple[int, int]]:
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min
                 for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max
                 for g in range(md.num_row_groups))
        spans.append((lo, hi))
    return spans


def test_zkey_is_deterministic_and_preserves_rows(grid):
    keyed = zorder_key(grid, ["x", "y"], bits=6)
    assert keyed.count() == N
    assert set(keyed.columns) == {"rid", "x", "y", "_zkey"}
    a = {r.rid: r._zkey for r in keyed.collect()}
    b = {r.rid: r._zkey for r in zorder_key(grid, ["x", "y"], bits=6).collect()}
    assert a == b


def test_zorder_bounds_every_dimension_per_file(grid, tmp_path):
    """Each z-ordered file covers a small rectangle: per-file spans of
    BOTH columns average well under half the global range (a naive
    single-column sort leaves the other column at ~full range)."""
    zpath = str(tmp_path / "z")
    write_zordered(grid, zpath, ["x", "y"], bits=6, num_files=FILES)

    for col in ("x", "y"):
        spans = _file_spans(zpath, col)
        assert len(spans) == FILES
        avg_span = sum(hi - lo for lo, hi in spans) / len(spans)
        assert avg_span < 0.5 * (N - 1), (col, avg_span)

    # sanity: a plain sort by x alone leaves y unclustered
    xpath = str(tmp_path / "x")
    (
        grid.repartitionByRange(FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    y_spans = _file_spans(xpath, "y")
    avg_y = sum(hi - lo for lo, hi in y_spans) / len(y_spans)
    assert avg_y > 0.9 * (N - 1)


def test_zorder_skips_files_for_conjunctive_predicate(grid, tmp_path):
    """Footer-stat pruning: a small (x, y) box intersects few z-files."""
    zpath = str(tmp_path / "z2")
    write_zordered(grid, zpath, ["x", "y"], bits=6, num_files=FILES)
    x_spans = _file_spans(zpath, "x")
    y_spans = _file_spans(zpath, "y")
    lo, hi = N // 2, N // 2 + N // 16  # a 1/16th box in each dimension
    hit = sum(
        1
        for (xl, xh), (yl, yh) in zip(x_spans, y_spans)
        if xl <= hi and xh >= lo and yl <= hi and yh >= lo
    )
    assert hit <= FILES // 2, hit


def test_zorder_rows_roundtrip(grid, tmp_path, spark):
    zpath = str(tmp_path / "z3")
    write_zordered(grid, zpath, ["x", "y"], bits=6, num_files=FILES)
    back = spark.read.parquet(zpath)
    assert {tuple(r) for r in back.select("rid", "x", "y").collect()} == {
        tuple(r) for r in grid.collect()
    }


def test_compact_partition_merges_small_files(spark, tmp_path):
    from commerce_sessionization_spark.sources.io import compact_partition

    p = str(tmp_path / "frag")
    df = spark.range(0, 10_000).selectExpr("id", "id % 7 AS k")
    df.repartition(64).write.parquet(p)  # 64 tiny files
    import glob
    assert len(glob.glob(p + "/part-*")) == 64
    n = compact_partition(spark, p, df.schema, target_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(p + "/part-*")) == 1
    out = spark.read.schema(df.schema).parquet(p)
    assert out.count() == 10_000
    assert out.agg({"id": "sum"}).collect()[0][0] == 10_000 * 9_999 // 2
    # idempotent re-run
    assert compact_partition(spark, p, df.schema, target_bytes=1 << 30) == 1
    assert spark.read.schema(df.schema).parquet(p).count() == 10_000


def test_global_rank_matches_single_partition_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from commerce_sessionization_spark.operators.layout import global_rank

    # adversarial order: ties in the first key, unique tiebreak second
    df = spark.range(0, 5_000).selectExpr(
        "id", "cast(id % 97 as int) AS bucket"
    )
    got = global_rank(df, order_cols=("bucket", "id"), num_partitions=8)
    want = df.withColumn(
        "rank", F.row_number().over(Window.orderBy("bucket", "id"))
    )
    assert {tuple(r) for r in got.select("id", "bucket", "rank").collect()} == {
        tuple(r) for r in want.select("id", "bucket", "rank").collect()
    }
    # dense 1..N with no gaps
    n = df.count()
    stats = got.agg(
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
        F.countDistinct("rank").alias("d"),
    ).collect()[0]
    assert (stats["lo"], stats["hi"], stats["d"]) == (1, n, n)


def test_global_rank_invariant_to_partition_count(spark):
    from commerce_sessionization_spark.operators.layout import global_rank

    df = spark.range(0, 2_000).selectExpr("id", "cast(id % 13 as int) AS b")
    a = global_rank(df, order_cols=("b", "id"), num_partitions=3)
    b = global_rank(df, order_cols=("b", "id"), num_partitions=17)
    assert {tuple(r) for r in a.select("id", "rank").collect()} == {
        tuple(r) for r in b.select("id", "rank").collect()
    }


def test_bloom_sink_writes_filters(spark, tmp_path):
    """The bloom option must actually reach the writer: same data with a
    bloom on the high-NDV column produces a measurably larger file
    (the filter's bitset), and the payload reads back identically."""
    import glob
    import os

    from commerce_sessionization_spark.sources.io import write_parquet_with_bloom

    df = spark.range(0, 50_000).selectExpr(
        "sha2(cast(id AS string), 256) AS uid", "id % 100 AS v"
    ).coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    df.write.mode("overwrite").parquet(plain)
    write_parquet_with_bloom(df, bloomed, {"uid": 50_000})

    size = lambda p: sum(
        os.path.getsize(f) for f in glob.glob(p + "/part-*.parquet")
    )
    # a 50k-NDV bloom at default fpp is tens of KB — well above noise
    assert size(bloomed) > size(plain) + 10_000, (size(plain), size(bloomed))
    back = spark.read.parquet(bloomed)
    assert back.count() == 50_000
    assert back.filter("v = 3").count() == 500
