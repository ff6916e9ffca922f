"""Continuous-aggregate rollup: merge-law and state-shape tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from commerce_sessionization_spark.operators.rollup import (
    merge_rollups,
    time_bucket_rollup,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 1, 1, h, m), value=float(v)) for h, m, v in rows]
    )


def _canon(df):
    return sorted(
        (r["bucket_ts"], r["cnt"], str(r["sum_value"]), r["min_value"], r["max_value"])
        for r in df.collect()
    )


def test_merge_equals_direct_any_split(spark):
    rows = [(10, 5, 1.25), (10, 20, 2.5), (10, 59, 4.0), (11, 0, 8.0), (12, 30, 0.5)]
    full = _events(spark, rows)
    direct = time_bucket_rollup(full)
    for cut in (1, 2, 4):
        a = time_bucket_rollup(_events(spark, rows[:cut]))
        b = time_bucket_rollup(_events(spark, rows[cut:]))
        assert _canon(merge_rollups(a, b)) == _canon(direct)


def test_merge_is_associative_and_variadic(spark):
    rows = [(9, i, i + 0.5) for i in range(6)]
    parts = [
        time_bucket_rollup(_events(spark, rows[i : i + 2])) for i in (0, 2, 4)
    ]
    all_at_once = merge_rollups(*parts)
    nested = merge_rollups(merge_rollups(parts[0], parts[1]), parts[2])
    direct = time_bucket_rollup(_events(spark, rows))
    assert _canon(all_at_once) == _canon(nested) == _canon(direct)


def test_state_is_bucket_sized_not_event_sized(spark):
    rows = [(10, m % 60, 1.0) for m in range(50)]  # 50 events, one bucket
    state = time_bucket_rollup(_events(spark, rows))
    assert state.count() == 1
    r = state.collect()[0]
    assert r["cnt"] == 50 and float(r["sum_value"]) == 50.0


# --------------------------------------------------------------------------
# Streaming continuous aggregate (exactly-once incremental maintenance)
# --------------------------------------------------------------------------

def _ev_df(spark, rows):
    return spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 1, 1, h, m), event_type=t, value=float(v))
         for h, m, t, v in rows]
    )


EPOCH_0 = [(10, 0, "view", 1.0), (10, 30, "view", 2.0), (10, 45, "cart", 3.0)]
EPOCH_1 = [(10, 50, "view", 4.0), (11, 5, "purchase", 8.0)]


def _state_totals(df):
    return sorted(
        (str(r["bucket_ts"]), r["event_type"], r["cnt"], str(r["sum_value"]))
        for r in df.collect()
    )


def test_rollup_writer_incremental_equals_direct(spark, tmp_path):
    from commerce_sessionization_spark.streaming.rollup_stream import (
        make_rollup_writer,
        read_rollup_state,
    )

    out = str(tmp_path / "ra")
    write = make_rollup_writer(spark, out)
    write(_ev_df(spark, EPOCH_0), 0)
    write(_ev_df(spark, EPOCH_1), 1)
    direct = time_bucket_rollup(_ev_df(spark, EPOCH_0 + EPOCH_1), keys=("event_type",))
    assert _state_totals(read_rollup_state(spark, out)) == _state_totals(direct)


def test_rollup_writer_epoch_replay_does_not_double_count(spark, tmp_path):
    from commerce_sessionization_spark.streaming.rollup_stream import (
        make_rollup_writer,
        read_rollup_state,
    )

    out = str(tmp_path / "rb")
    write = make_rollup_writer(spark, out)
    write(_ev_df(spark, EPOCH_0), 0)
    write(_ev_df(spark, EPOCH_1), 1)
    before = _state_totals(read_rollup_state(spark, out))
    # crash-after-write-before-checkpoint-commit ⇒ same epoch re-delivered
    write(_ev_df(spark, EPOCH_1), 1)
    write(_ev_df(spark, EPOCH_1), 1)
    assert _state_totals(read_rollup_state(spark, out)) == before


def test_rollup_stream_end_to_end(spark, tmp_path):
    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType, TimestampType,
    )
    from commerce_sessionization_spark.streaming.rollup_stream import (
        read_rollup_state,
        rollup_stream,
    )

    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ])
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate([EPOCH_0, EPOCH_1]):
        _ev_df(spark, rows).coalesce(1).write.parquet(str(src / f"d{i}.parquet"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/d*.parquet")
    )
    out = str(tmp_path / "rc")
    q = rollup_stream(stream, spark, out, str(tmp_path / "ckpt"))
    # availableNow isn't set on this long-lived API; drain manually
    import time as _t
    for _ in range(120):
        if q.lastProgress and q.lastProgress["numInputRows"] == 0:
            break
        _t.sleep(0.5)
    q.stop()
    direct = time_bucket_rollup(_ev_df(spark, EPOCH_0 + EPOCH_1), keys=("event_type",))
    assert _state_totals(read_rollup_state(spark, out)) == _state_totals(direct)


def test_cms_writer_incremental_equals_direct_and_replay_safe(spark, tmp_path):
    """The generic maintainer carries sketch algebra too: streaming
    count-min state == the sketch of all rows, and replay never
    double-counts cells."""
    from pyspark.sql import functions as F
    from commerce_sessionization_spark.operators.sketches import count_min_cells
    from commerce_sessionization_spark.streaming.rollup_stream import (
        make_cms_writer,
        read_rollup_state,
    )

    def toks(spark, words):
        return spark.createDataFrame([Row(tok=w) for w in words])

    w0 = ["a", "b", "a", "c"]
    w1 = ["a", "c", "c", "d"]
    out = str(tmp_path / "cms")
    write = make_cms_writer(spark, out, "tok")
    write(toks(spark, w0), 0)
    write(toks(spark, w1), 1)
    write(toks(spark, w1), 1)  # replay
    got = {
        (r["r_idx"], r["c_idx"]): r["cnt"]
        for r in read_rollup_state(spark, out).collect()
    }
    want = {
        (r["r_idx"], r["c_idx"]): r["cnt"]
        for r in count_min_cells(toks(spark, w0 + w1), "tok").collect()
    }
    assert got == want


def test_bottomk_writer_incremental_equals_direct_and_replay_safe(spark, tmp_path):
    """Streaming bottom-k sample state == the sample of all rows ever
    seen, and epoch replay rewrites the identical version."""
    from commerce_sessionization_spark.operators.sketches import bottomk_sample
    from commerce_sessionization_spark.streaming.rollup_stream import (
        make_bottomk_writer,
        read_rollup_state,
    )

    def batch(lo, hi):
        return spark.range(lo, hi).selectExpr("id", "id * 3 AS v")

    out = str(tmp_path / "bk")
    write = make_bottomk_writer(spark, out, "id", keep_cols=("v",), k=16)
    write(batch(0, 500), 0)
    write(batch(500, 1000), 1)
    write(batch(500, 1000), 1)  # replay must be a no-op rewrite
    got = sorted(map(tuple, read_rollup_state(spark, out).collect()))
    want = sorted(
        map(tuple, bottomk_sample(batch(0, 1000), "id", k=16,
                                  keep_cols=("v",)).collect())
    )
    assert got == want and len(got) == 16


def test_checksum_writer_matches_batch_fingerprint_and_replays(spark, tmp_path):
    from pyspark.sql import functions as F

    from commerce_sessionization_spark.functions.hashing import hex_to_long
    from commerce_sessionization_spark.streaming.rollup_stream import (
        make_checksum_writer,
        read_rollup_state,
    )

    def batch(lo, hi):
        return spark.range(lo, hi).selectExpr("id", "CAST(id % 5 AS STRING) AS s")

    out = str(tmp_path / "ck")
    write = make_checksum_writer(spark, out, ["id", "s"])
    write(batch(0, 400), 0)
    write(batch(400, 900), 1)
    write(batch(400, 900), 1)  # replay: must not double-fold
    got = read_rollup_state(spark, out).collect()[0]

    pre = F.concat_ws(
        "\x01", F.coalesce(F.col("id").cast("string"), F.lit("\x00")),
        F.coalesce(F.col("s").cast("string"), F.lit("\x00")),
    )
    want = batch(0, 900).agg(
        F.count(F.lit(1)).alias("n"),
        F.pmod(
            F.sum(hex_to_long(F.sha2(pre, 256)).cast("decimal(38,0)")),
            F.lit(2 ** 60).cast("decimal(38,0)"),
        ).cast("long").alias("c"),
    ).collect()[0]
    assert (got["n_rows"], got["checksum"]) == (want["n"], want["c"])


def test_dsir_writer_streamed_stats_equal_batch_weights_and_replay(
    spark, tmp_path
):
    """The streaming DSIR maintainer's law: corpus statistics folded
    epoch-by-epoch, then scored via dsir_log_ratios + dsir_score, must
    equal the batch dsir_weights over all rows ever seen — and epoch
    replay must rewrite the identical state version (exactly-once)."""
    from pyspark.sql import functions as F

    from commerce_sessionization_spark.operators.sampling import (
        dsir_log_ratios,
        dsir_score,
        dsir_weights,
    )
    from commerce_sessionization_spark.sources.tables import load_table
    from commerce_sessionization_spark.streaming.rollup_stream import (
        make_dsir_writer,
        read_rollup_state,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    out = str(tmp_path / "dsir")
    write = make_dsir_writer(spark, out)
    write(b0, 0)
    write(b1, 1)
    write(b1, 1)  # replay: counts must not double-fold
    state = read_rollup_state(spark, out)

    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_w_q6"])
        for r in dsir_score(docs, dsir_log_ratios(state)).collect()
    }
    want = {
        r["doc_id"]: (r["n_grams"], r["dsir_w_q6"])
        for r in dsir_weights(
            docs, docs.filter(F.col("lang") == "en")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_vector_stats_writer_streamed_equals_batch_and_replay(
    spark, tmp_path
):
    """The streaming PCA-stats maintainer's law: sufficient statistics
    folded epoch-by-epoch must be BIT-equal (exact decimal) to the
    batch one-pass stats over all rows ever seen, and epoch replay must
    rewrite the identical version instead of double-counting."""
    from pyspark.sql import functions as F

    from commerce_sessionization_spark.operators.ml import (
        vector_sufficient_stats,
    )
    from commerce_sessionization_spark.sources.tables import load_table
    from commerce_sessionization_spark.streaming.rollup_stream import (
        make_vector_stats_writer,
        read_rollup_state,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = str(tmp_path / "vecstats")
    write = make_vector_stats_writer(spark, out, dim=64)
    for epoch in range(3):
        write(emb.filter(F.col("vec_id") % 3 == epoch), epoch)
    write(emb.filter(F.col("vec_id") % 3 == 2), 2)  # replay last epoch

    got = {
        (r.i, r.j): str(r.s)
        for r in read_rollup_state(spark, out).collect()
    }
    want = {
        (r.i, r.j): str(r.s)
        for r in vector_sufficient_stats(emb, dim=64).collect()
    }
    assert got == want
    assert len(got) == 64 * 67 // 2 + 1  # d(d+3)/2 cells + the n row


def test_drift_writer_streamed_counts_equal_batch_and_replay(spark, tmp_path):
    """Streaming drift monitor law: bucket counts folded epoch-by-epoch
    against FROZEN reference bounds equal the batch counts over all rows
    ever seen, and replaying an epoch does not double-count."""
    from pyspark.sql import functions as F

    from commerce_sessionization_spark.operators.dq import (
        drift_bounds,
        drift_bucket_counts,
    )
    from commerce_sessionization_spark.sources.tables import load_table
    from commerce_sessionization_spark.streaming.rollup_stream import (
        make_drift_writer,
        read_rollup_state,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    ref = orders.filter(F.col("o_orderkey") % 3 == 0)
    cur = orders.filter(F.col("o_orderkey") % 3 != 0)
    cols = ["o_totalprice", "o_custkey"]
    bounds = drift_bounds(ref, cols)

    out = str(tmp_path / "drift")
    write = make_drift_writer(spark, out, bounds, cols)
    for epoch in range(3):
        write(cur.filter(F.col("o_custkey") % 3 == epoch), epoch)
    write(cur.filter(F.col("o_custkey") % 3 == 1), 1)  # replay mid epoch

    got = {
        (r._col, r._b): r.n for r in read_rollup_state(spark, out).collect()
    }
    want = {
        (r._col, r._b): r.n
        for r in drift_bucket_counts(cur, bounds, cols).collect()
    }
    assert got == want and len(got) > 0
