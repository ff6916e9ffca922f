"""Streaming dedup ingestion: exactly-once corpus + fingerprint index.

Epochs are driven directly against the foreachBatch fn (the maintainer's
documented test surface), plus one end-to-end readStream run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from commerce_sessionization_spark.streaming.ingest_dedup import (
    make_dedup_ingest_writer,
    read_corpus,
    stream_dedup_ingest,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_epochs_dedup_within_and_across(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write = make_dedup_ingest_writer(spark, out)

    write(_batch(spark, [(1, "aaa"), (2, "aaa"), (3, "bbb")]), 1)
    # epoch 2 re-delivers doc 3's content under a new id + brings new docs
    write(_batch(spark, [(4, "bbb"), (5, "ccc"), (6, "ccc")]), 2)

    corpus = read_corpus(spark, out)
    texts = sorted(r.text for r in corpus.collect())
    assert texts == ["aaa", "bbb", "ccc"]
    assert sorted(r.doc_id for r in corpus.collect()) == [1, 3, 5]


def test_epoch_replay_does_not_duplicate(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write = make_dedup_ingest_writer(spark, out)
    b1 = _batch(spark, [(1, "aaa"), (2, "bbb")])
    b2 = _batch(spark, [(3, "bbb"), (4, "ccc")])
    write(b1, 1)
    write(b2, 2)
    before = sorted(
        (r.doc_id, r.text) for r in read_corpus(spark, out).collect()
    )
    # crash-replay of the newest epoch: same batch, same epoch id
    write(b2, 2)
    after = sorted(
        (r.doc_id, r.text) for r in read_corpus(spark, out).collect()
    )
    assert before == after == [(1, "aaa"), (2, "bbb"), (4, "ccc")]
    assert [t for _, t in after].count("bbb") == 1


def test_index_accumulates_all_fingerprints(spark, tmp_path):
    from commerce_sessionization_spark.streaming.rollup_stream import (
        read_rollup_state,
    )

    out = str(tmp_path / "corpus")
    write = make_dedup_ingest_writer(spark, out)
    write(_batch(spark, [(1, "aaa")]), 1)
    write(_batch(spark, [(2, "bbb")]), 2)
    state = read_rollup_state(spark, out)
    assert state.count() == 2  # both hashes survive in the latest version


def test_end_to_end_readstream(spark, tmp_path):
    src = str(tmp_path / "drops")
    out = str(tmp_path / "corpus")
    df = _batch(
        spark, [(1, "xxx"), (2, "xxx"), (3, "yyy"), (4, "zzz"), (5, "yyy")]
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = stream_dedup_ingest(stream, out, str(tmp_path / "ck"))
    q.awaitTermination(120)
    corpus = read_corpus(spark, out)
    assert sorted(r.text for r in corpus.collect()) == ["xxx", "yyy", "zzz"]
    # restart with no new files: no new epochs, corpus unchanged
    q2 = stream_dedup_ingest(
        spark.readStream.schema(df.schema).parquet(src), out, str(tmp_path / "ck")
    )
    q2.awaitTermination(120)
    assert read_corpus(spark, out).count() == 3


# ---------------------------------------------------------------------------
# Near-dup-aware ingestion (LSH band index as the corpus state)
# ---------------------------------------------------------------------------

_BASE = "the quick brown fox jumps over the lazy dog while rain falls on the quiet town square tonight"


def _ndoc(doc_id, text):
    return (doc_id, text)


def test_incremental_neardup_dedup_batch_rules(spark):
    """Corpus hit, near-dup hit, in-batch min-id rule, fresh doc kept."""
    from commerce_sessionization_spark.operators.dedup import (
        incremental_neardup_dedup,
        lsh_band_table,
        minhash_lsh_candidates,
    )

    corpus = _batch(spark, [_ndoc(1, _BASE)])
    index = lsh_band_table(corpus)
    batch = _batch(
        spark,
        [
            _ndoc(10, _BASE),                      # exact re-crawl -> drop
            _ndoc(11, _BASE + " extra"),           # near-dup -> drop
            _ndoc(12, "completely different words about spark shuffles and "
                      "parquet footers and broadcast joins at scale"),
            _ndoc(13, "completely different words about spark shuffles and "
                      "parquet footers and broadcast joins at scale"),
            # 12/13 identical: in-batch min-id keeps 12
        ],
    )
    kept = incremental_neardup_dedup(batch, index)
    assert sorted(r.doc_id for r in kept.collect()) == [12]

    # invariant: corpus + kept has zero LSH candidate pairs
    merged = corpus.unionByName(kept)
    assert minhash_lsh_candidates(merged).count() == 0


def test_neardup_ingest_writer_epochs_and_replay(spark, tmp_path):
    """Near-dup ingestion across epochs: exact and near re-deliveries
    blocked by the band index, replay rewrites identically, and the
    final corpus holds no LSH candidate pair."""
    from commerce_sessionization_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from commerce_sessionization_spark.streaming.ingest_dedup import (
        make_neardup_ingest_writer,
    )

    out = str(tmp_path / "ndcorpus")
    write = make_neardup_ingest_writer(spark, out)

    write(_batch(spark, [_ndoc(1, _BASE), _ndoc(2, _BASE)]), 1)
    b2 = _batch(
        spark,
        [
            _ndoc(3, _BASE + " appended"),          # near-dup of epoch-1 doc
            _ndoc(4, "fresh unrelated content on columnar execution and "
                     "adaptive query plans with skew handling enabled"),
        ],
    )
    write(b2, 2)
    write(b2, 2)  # crash replay: identical recompute

    corpus = read_corpus(spark, out)
    assert sorted(r.doc_id for r in corpus.collect()) == [1, 4]
    assert minhash_lsh_candidates(corpus).count() == 0
