"""Streaming k-means/IVF index maintenance (round-9 stretch item):
``make_centroid_stats_writer`` + ``centroids_from_stats`` close the
training loop — per-centroid sufficient stats maintained through MVCC
epochs under a pinned cosine E-step, refit centroids (one batch Lloyd
M-step) available at any time with no corpus re-read.

Four contracts:

1. **Pure-function law** — the maintained state after 3 epochs equals
   the direct batch M-step over all rows ever seen (exact decimal, so
   bit-equal; the catalog query ``stream_centroid_refit`` grades the
   same law against the DuckDB replay).
2. **Crash replay** — re-driving the newest epoch rewrites the
   identical version (foreachBatch at-least-once safety).
3. **Plumbing exactness** — the refit centroids are a valid quantizer:
   searching them at nprobe = nlist reproduces brute force exactly.
4. **Recall drift** — the measurement the maintainer exists for: a
   quantizer seeded before a distribution shift (epoch 0 covers labels
   0-4 only; epochs 1-2 bring labels 5-9) loses recall on queries from
   the new region, and the streaming refit recovers part of it without
   re-reading the corpus. Deterministic fixture, strict inequality.
"""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.similarity import (
    all_pairs_topk,
    ivf_assign,
    ivf_search_many,
    seed_centroids,
)
from commerce_sessionization_spark.sources.tables import load_table
from commerce_sessionization_spark.streaming.rollup_stream import (
    centroids_from_stats,
    make_centroid_stats_writer,
    read_rollup_state,
)

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


def _drive(spark, emb, seeds, out, epochs):
    shutil.rmtree(out, ignore_errors=True)
    writer = make_centroid_stats_writer(spark, out, seeds)
    for i, ep in enumerate(epochs):
        writer(ep, i)
    return writer


def _state_rows(spark, out):
    return sorted(
        (r.centroid_id, r.i, str(r.s), r.n)
        for r in read_rollup_state(spark, out).collect()
    )


def test_maintained_state_equals_batch_m_step(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    seeds = seed_centroids(emb, nlist=4).localCheckpoint()
    out = str(tmp_path / "state")
    _drive(
        spark, emb, seeds, out,
        [emb.filter(F.col("vec_id") % 3 == e) for e in range(3)],
    )
    got = _state_rows(spark, out)

    # direct batch M-step over the full corpus, same pinned E-step
    grid = F.lit(1e9)
    vq = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * grid).cast("decimal(19,0)"),
    )
    direct = sorted(
        (r.centroid_id, r.i, str(r.s), r.n)
        for r in ivf_assign(emb, seeds)
        .select("centroid_id", F.posexplode(vq).alias("_i", "_x"))
        .groupBy("centroid_id", (F.col("_i") + 1).alias("i"))
        .agg(
            F.sum("_x").cast("decimal(38,0)").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert got == direct


def test_epoch_replay_rewrites_identical_state(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    seeds = seed_centroids(emb, nlist=4).localCheckpoint()
    out = str(tmp_path / "state")
    epochs = [emb.filter(F.col("vec_id") % 3 == e) for e in range(3)]
    writer = _drive(spark, emb, seeds, out, epochs)
    before = _state_rows(spark, out)
    writer(epochs[2], 2)  # crash replay of the newest epoch
    assert _state_rows(spark, out) == before


def test_refit_centroids_are_a_valid_quantizer(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    seeds = seed_centroids(emb, nlist=4).localCheckpoint()
    out = str(tmp_path / "state")
    _drive(
        spark, emb, seeds, out,
        [emb.filter(F.col("vec_id") % 2 == e) for e in range(2)],
    )
    refit = centroids_from_stats(read_rollup_state(spark, out))
    assert refit.count() == 4
    # exhaustive probe over the refit quantizer == brute force
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assigned = ivf_assign(emb, refit)
    got = {
        (r.query_id, r.vec_id)
        for r in ivf_search_many(
            assigned, refit, queries, k=5, nprobe=4
        ).collect()
    }
    truth = {
        (r.query_id, r.vec_id)
        for r in all_pairs_topk(emb, queries, k=5).collect()
    }
    assert got == truth


def test_streaming_refit_recovers_recall_after_distribution_shift(spark):
    """The drift scenario the maintainer exists for: seeds fitted on
    labels 0-4 only, epochs 1-2 stream in labels 5-9, queries come from
    the new region. Measured at sf0.01, nprobe=2 of 8 (deterministic):
    stale 15/35 hits vs refit 16.8/35 — the refit must be strictly
    better and both measurements sane."""
    emb = load_table(spark, SF_DIR_01, "embeddings")
    e0 = emb.filter(F.col("label") < 5)
    e1 = emb.filter((F.col("label") >= 5) & (F.col("vec_id") % 2 == 0))
    e2 = emb.filter((F.col("label") >= 5) & (F.col("vec_id") % 2 == 1))
    stale = seed_centroids(e0, nlist=8).localCheckpoint()
    out = "/tmp/spark_graft_test_centroid_drift"
    _drive(spark, emb, stale, out, [e0, e1, e2])
    refit = centroids_from_stats(
        read_rollup_state(spark, out)
    ).localCheckpoint()

    queries = emb.filter(
        (F.col("label") >= 5) & (F.col("vec_id") % 7 == 0)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    truth = {
        (r.query_id, r.vec_id)
        for r in all_pairs_topk(emb, queries, k=10).collect()
    }

    def recall(cents):
        a = ivf_assign(emb, cents)
        got = {
            (r.query_id, r.vec_id)
            for r in ivf_search_many(
                a, cents, queries, k=10, nprobe=2
            ).collect()
        }
        return len(got & truth) / len(truth)

    r_stale, r_refit = recall(stale), recall(refit)
    assert 0.2 < r_stale < 1.0
    assert r_refit > r_stale
    shutil.rmtree(out, ignore_errors=True)


def test_state_is_self_describing_about_its_grid(spark, tmp_path):
    """Review fix (round-9): the writer stamps qscale on every cell and
    centroids_from_stats reads the grid back — a writer at scale 6 and
    one at scale 9 must refit to (nearly) the same centroids without
    the caller repeating the knob, and mixed-scale states are refused."""
    import pytest

    emb = load_table(spark, SF_DIR, "embeddings")
    seeds = seed_centroids(emb, nlist=4).localCheckpoint()
    outs = {}
    for scale in (6, 9):
        out = str(tmp_path / f"s{scale}")
        writer = make_centroid_stats_writer(
            spark, out, seeds, quantize_scale=scale
        )
        writer(emb, 0)
        outs[scale] = {
            r.centroid_id: list(r.embedding)
            for r in centroids_from_stats(
                read_rollup_state(spark, out)
            ).collect()
        }
    for cid in outs[9]:
        for a, b in zip(outs[6][cid], outs[9][cid]):
            assert abs(a - b) < 1e-5  # only quantization error apart

    # mixed scales in one state: loud refusal, never a silent average
    mixed = read_rollup_state(spark, str(tmp_path / "s6")).unionByName(
        read_rollup_state(spark, str(tmp_path / "s9"))
    )
    with pytest.raises(ValueError, match="mixed quantize grids"):
        centroids_from_stats(mixed)
