"""Closed-form distributed regression: planted-model recovery."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.ml import (
    apply_linear_model,
    fit_ridge_regression,
)


def _planted(spark, n=5000, noise=False):
    # deterministic pseudo-features from hashes; y = 3x1 - 2x2 + 0.5x3 + 7
    df = spark.range(0, n).selectExpr(
        "CAST(pmod(hash(id, 1), 1000) AS DOUBLE) / 100 AS x1",
        "CAST(pmod(hash(id, 2), 1000) AS DOUBLE) / 100 AS x2",
        "CAST(pmod(hash(id, 3), 1000) AS DOUBLE) / 100 AS x3",
        "CAST(pmod(hash(id, 9), 199) AS DOUBLE) / 995 AS eps",
    )
    y = 3 * F.col("x1") - 2 * F.col("x2") + 0.5 * F.col("x3") + 7
    if noise:
        y = y + F.col("eps")
    return df.withColumn("y", y)


def test_fit_recovers_planted_weights_exactly(spark):
    df = _planted(spark)
    w, b = fit_ridge_regression(df, ["x1", "x2", "x3"], "y")
    assert np.allclose(w, [3.0, -2.0, 0.5], atol=1e-8)
    assert b == pytest.approx(7.0, abs=1e-7)


def test_fit_matches_numpy_lstsq_under_noise(spark):
    df = _planted(spark, noise=True)
    w, b = fit_ridge_regression(df, ["x1", "x2", "x3"], "y")
    pdf = df.select("x1", "x2", "x3", "y").toPandas()
    X = np.column_stack([pdf[c] for c in ("x1", "x2", "x3")] + [np.ones(len(pdf))])
    ref, *_ = np.linalg.lstsq(X, pdf["y"].to_numpy(), rcond=None)
    assert np.allclose(w, ref[:-1], atol=1e-6) and b == pytest.approx(ref[-1], abs=1e-6)


def test_ridge_shrinks_weights_but_not_intercept_direction(spark):
    df = _planted(spark, noise=True)
    w0, _ = fit_ridge_regression(df, ["x1", "x2", "x3"], "y", l2=0.0)
    w1, _ = fit_ridge_regression(df, ["x1", "x2", "x3"], "y", l2=1e4)
    assert np.linalg.norm(w1) < np.linalg.norm(w0)


def test_apply_linear_model_is_columnar(spark):
    df = _planted(spark, n=100)
    w, b = fit_ridge_regression(df, ["x1", "x2", "x3"], "y")
    scored = apply_linear_model(df, ["x1", "x2", "x3"], w, b)
    resid = scored.select(
        F.max(F.abs(F.col("prediction") - F.col("y"))).alias("m")
    ).collect()[0]["m"]
    assert resid < 1e-7


# ---------------------------------------------------------------------------
# PCA via one-pass sufficient statistics
# ---------------------------------------------------------------------------

def _planted_vectors(spark, n=2000, d=8, noise_scale=1.0):
    """Deterministic anisotropic cloud: two dominant directions with
    variances ~25 and ~4, the rest hash noise of amplitude
    ``noise_scale``."""
    cols = []
    for i in range(d):
        noise = (
            f"(CAST(pmod(hash(id, {i + 10}), 997) AS DOUBLE) / 997 - 0.5)"
            f" * {noise_scale}"
        )
        cols.append(noise)
    # dominant axes: t in [-0.5, 0.5) scaled onto e1 (sd 5) and e2 (sd 2)
    t1 = "CAST(pmod(hash(id, 1), 9973) AS DOUBLE) / 9973 - 0.5"
    t2 = "CAST(pmod(hash(id, 2), 9973) AS DOUBLE) / 9973 - 0.5"
    cols[0] = f"({cols[0]}) * 0.01 + ({t1}) * 17.3"
    cols[1] = f"({cols[1]}) * 0.01 + ({t2}) * 6.9"
    arr = "array(" + ", ".join(f"CAST({c} AS FLOAT)" for c in cols) + ")"
    return spark.range(0, n).selectExpr("id AS vec_id", f"{arr} AS embedding")


class TestPCA:
    def test_covariance_matches_numpy(self, spark):
        from commerce_sessionization_spark.operators.ml import (
            covariance_from_stats,
            vector_sufficient_stats,
        )
        df = _planted_vectors(spark, n=500, d=6)
        X = np.array(
            [r.embedding for r in df.select("embedding").collect()],
            dtype=np.float64,
        )
        Xq = np.floor(X * 1e9) / 1e9  # the operator's integer grid
        want = np.cov(Xq.T, bias=True)
        rows = covariance_from_stats(vector_sufficient_stats(df)).collect()
        got = np.zeros((6, 6))
        for r in rows:
            got[r.i - 1, r.j - 1] = got[r.j - 1, r.i - 1] = r.cov
        assert len(rows) == 6 * 7 // 2
        assert np.abs(got - want).max() < 1e-12

    def test_pca_recovers_planted_axes(self, spark):
        from commerce_sessionization_spark.operators.ml import pca_fit
        df = _planted_vectors(spark)
        comps, mean, ev = pca_fit(df, k=3)
        # top component ~ e1, second ~ e2; variances ordered
        assert abs(comps[0][0]) > 0.999 and abs(comps[1][1]) > 0.999
        assert ev[0] > ev[1] > ev[2] > 0
        # sign convention: dominant coordinate positive
        assert comps[0][np.argmax(np.abs(comps[0]))] > 0

    def test_projection_matches_numpy(self, spark):
        from commerce_sessionization_spark.operators.ml import (
            pca_fit,
            pca_project,
        )
        df = _planted_vectors(spark, n=300)
        comps, mean, _ = pca_fit(df, k=2)
        rows = pca_project(df, comps, mean).select("vec_id", "embedding", "pca").collect()
        X = np.array([r.embedding for r in rows], dtype=np.float64)
        got = np.array([r.pca for r in rows])
        want = (X - mean) @ np.asarray(comps).T
        assert got.shape == (300, 2)
        assert np.abs(got - want).max() < 1e-9

    def test_reconstruction_error_decreases_in_k(self, spark):
        from commerce_sessionization_spark.operators.ml import (
            pca_fit,
            pca_project,
        )
        df = _planted_vectors(spark, n=400)
        errs = []
        for k in (1, 2, 4):
            comps, mean, _ = pca_fit(df, k=k)
            rows = pca_project(df, comps, mean).select("embedding", "pca").collect()
            X = np.array([r.embedding for r in rows], dtype=np.float64)
            Y = np.array([r.pca for r in rows])
            recon = Y @ np.asarray(comps) + mean
            errs.append(float(((X - recon) ** 2).sum()))
        assert errs[0] > errs[1] > errs[2]


class TestPCACompressedSearch:
    """PCA as the data-aware compression stage for ANN — at equal output
    dim it must beat the data-oblivious JL projection on anisotropic
    data (it is the variance-optimal linear map; JL can't use the
    spectrum)."""

    def _recall(self, spark, corpus, queries, vec_col, k=5):
        from commerce_sessionization_spark.operators.similarity import (
            all_pairs_topk,
        )
        truth = {
            (r.query_id, r.vec_id)
            for r in all_pairs_topk(
                corpus, queries, k=k, vec_col="embedding"
            ).collect()
        }
        got = {
            (r.query_id, r.vec_id)
            for r in all_pairs_topk(
                corpus.withColumnRenamed(vec_col, "_sv"),
                queries.withColumnRenamed(vec_col, "_sv"),
                k=k,
                vec_col="_sv",
            ).collect()
        }
        return len(truth & got) / len(truth)

    def test_pca4_beats_jl4_on_anisotropic_data(self, spark):
        from commerce_sessionization_spark.operators.ml import (
            pca_fit,
            pca_project,
        )
        from commerce_sessionization_spark.operators.similarity import (
            jl_project,
        )
        corpus = _planted_vectors(spark, n=600, d=16, noise_scale=0.05).cache()
        queries = _planted_vectors(spark, n=620, d=16, noise_scale=0.05).filter(
            F.col("vec_id") >= 600
        ).withColumnRenamed("vec_id", "query_id")
        comps, mean, _ = pca_fit(corpus, k=4)
        pc = pca_project(corpus, comps, mean, out_col="red", center=False)
        pq = pca_project(queries, comps, mean, out_col="red", center=False)
        jc = jl_project(corpus, in_dim=16, out_dim=4, out_col="red")
        jq = jl_project(queries, in_dim=16, out_dim=4, out_col="red")
        pca_recall = self._recall(spark, pc, pq, "red")
        jl_recall = self._recall(spark, jc, jq, "red")
        assert pca_recall >= jl_recall
        assert pca_recall >= 0.85


class TestMMRRerank:
    def _cands(self, spark):
        # query 1: A(1) and B(2) near-identical high scorers, C(3) distinct
        rows = [
            (1, 1, 0.99, [1.0, 0.0, 0.0]),
            (1, 2, 0.98, [0.999, 0.04, 0.0]),
            (1, 3, 0.90, [0.0, 1.0, 0.0]),
            (1, 4, 0.10, [0.0, 0.0, 1.0]),
            (2, 7, 0.80, [1.0, 0.0, 0.0]),
            (2, 8, 0.70, [0.0, 1.0, 0.0]),
        ]
        return spark.createDataFrame(
            rows, "query_id long, vec_id long, cosine double, embedding array<double>"
        )

    def test_lambda_one_is_plain_score_order(self, spark):
        from commerce_sessionization_spark.operators.similarity import (
            mmr_rerank,
        )
        out = mmr_rerank(self._cands(spark), k=4, lam=1.0)
        got = [
            r.vec_id
            for r in out.filter("query_id = 1").orderBy("mmr_rank").collect()
        ]
        assert got == [1, 2, 3, 4]

    def test_diversity_demotes_redundant_candidate(self, spark):
        from commerce_sessionization_spark.operators.similarity import (
            mmr_rerank,
        )
        out = mmr_rerank(self._cands(spark), k=3, lam=0.5)
        got = [
            r.vec_id
            for r in out.filter("query_id = 1").orderBy("mmr_rank").collect()
        ]
        # B (near-dup of A) must fall behind the distinct C
        assert got[0] == 1 and got[1] == 3

    def test_groups_independent_and_k_capped(self, spark):
        from commerce_sessionization_spark.operators.similarity import (
            mmr_rerank,
        )
        out = mmr_rerank(self._cands(spark), k=10, lam=0.5).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r)
        assert len(by_q[1]) == 4 and len(by_q[2]) == 2
        ranks = sorted(r.mmr_rank for r in by_q[2])
        assert ranks == [1, 2]

    def test_string_query_and_id_columns_supported(self, spark):
        """ADVICE r8: the applyInPandas output schema hardcoded `long`
        for the key columns despite them being configurable — string
        keys failed at runtime. Types now follow the input schema."""
        from commerce_sessionization_spark.operators.similarity import (
            mmr_rerank,
        )
        rows = [
            ("q1", "docA", 0.99, [1.0, 0.0]),
            ("q1", "docB", 0.98, [0.999, 0.01]),
            ("q1", "docC", 0.50, [0.0, 1.0]),
        ]
        df = spark.createDataFrame(
            rows,
            "query_id string, vec_id string, cosine double, "
            "embedding array<double>",
        )
        out = mmr_rerank(df, k=2, lam=0.5)
        got = [r.vec_id for r in out.orderBy("mmr_rank").collect()]
        assert got == ["docA", "docC"]
        assert dict(out.dtypes)["query_id"] == "string"
        assert dict(out.dtypes)["vec_id"] == "string"

    def test_first_rank_score_is_lambda_times_relevance(self, spark):
        from commerce_sessionization_spark.operators.similarity import (
            mmr_rerank,
        )
        out = mmr_rerank(self._cands(spark), k=2, lam=0.7)
        r1 = out.filter("query_id = 1 AND mmr_rank = 1").collect()[0]
        assert r1.mmr_score == pytest.approx(0.7 * 0.99)

    def test_exact_twin_same_picks_and_laws(self, spark):
        """mmr_rerank_exact (the oracle-graded integer-lattice twin)
        must make the same greedy picks as the double path on the
        fixture, cap per group, and obey the rank-1 score identity
        mmr_score_q == lam_num * floor(cos * grid)."""
        import math

        from commerce_sessionization_spark.operators.similarity import (
            mmr_rerank_exact,
        )

        out = mmr_rerank_exact(
            self._cands(spark), k=10, lam_num=5, lam_den=10
        ).collect()
        by_q = {}
        for r in sorted(out, key=lambda r: (r.query_id, r.mmr_rank)):
            by_q.setdefault(r.query_id, []).append(r)
        assert [r.vec_id for r in by_q[1]][:2] == [1, 3]  # B demoted
        assert len(by_q[1]) == 4 and len(by_q[2]) == 2
        r1 = by_q[1][0]
        assert r1.mmr_score_q == 5 * math.floor(0.99 * 1_000_000)

    def test_exact_twin_matches_double_twin_on_testdata(self, spark):
        """End-to-end 2e-6 parity pin between the graded integer-exact
        MMR query and its double-precision scale twin at sf0.001: same
        picked ids in the same order per query, objectives within 2e-6
        (quantization floor) — the _fast-twin discipline the graph
        family uses (tests/test_graph.py)."""
        from commerce_sessionization_spark.plans.queries import (
            q_mmr_diverse_topk,
            q_mmr_diverse_topk_fast,
        )

        sf_dir = "/root/testdata/sf0.001"
        exact = {
            (r.query_id, r.mmr_rank): r
            for r in q_mmr_diverse_topk(spark, sf_dir).collect()
        }
        fast = {
            (r.query_id, r.mmr_rank): r
            for r in q_mmr_diverse_topk_fast(spark, sf_dir).collect()
        }
        assert exact.keys() == fast.keys() and len(exact) == 15
        for key, er in exact.items():
            fr = fast[key]
            assert er.vec_id == fr.vec_id, f"pick diverged at {key}"
            # exact objective is scaled by lam_den * grid = 1e7;
            # fast's q6 floor is scaled by 1e6
            assert abs(er.mmr_score_q7 / 1e7 - fr.mmr_score_q6 / 1e6) < 2e-6


class TestWhitening:
    def test_whitened_projection_has_identity_covariance(self, spark):
        from commerce_sessionization_spark.operators.ml import (
            pca_fit,
            pca_project,
        )
        df = _planted_vectors(spark, n=800, d=6)
        comps, mean, ev = pca_fit(df, k=3)
        rows = pca_project(
            df, comps, mean, explained_variance=ev
        ).select("pca").collect()
        Y = np.array([r.pca for r in rows])
        C = np.cov(Y.T, bias=True)
        assert np.abs(C - np.eye(3)).max() < 1e-6


class TestHardNegatives:
    def test_cross_label_only_and_self_excluded(self, spark):
        from commerce_sessionization_spark.operators.similarity import (
            hard_negatives,
        )
        rows = [
            (0, [1.0, 0.0], 0),
            (1, [0.99, 0.1], 0),   # same label as anchor — excluded
            (2, [0.98, 0.2], 1),   # hardest cross-label negative
            (3, [0.0, 1.0], 1),
            (4, [1.0, 0.0], 1),    # exact-dup vector, different label
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        anchors = df.filter("vec_id = 0")
        out = hard_negatives(df, anchors, k=3).collect()
        ids = [r.vec_id for r in sorted(out, key=lambda r: -r.cosine)]
        assert 0 not in ids and 1 not in ids      # self + same-label out
        assert ids[0] == 4                         # exact dup = hardest
        assert set(ids) == {2, 3, 4}
        assert all(r.anchor_id == 0 for r in out)

    def test_k_bounds_per_anchor(self, spark):
        from commerce_sessionization_spark.operators.similarity import (
            hard_negatives,
        )
        rows = [(i, [float(i), 1.0], i % 2) for i in range(20)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        anchors = df.filter("vec_id < 2")
        out = hard_negatives(df, anchors, k=5).collect()
        per = {}
        for r in out:
            per.setdefault(r.anchor_id, 0)
            per[r.anchor_id] += 1
        assert per == {0: 5, 1: 5}


class TestCompressedSearchPipeline:
    """The composed retrieval path — PCA compress (4×) → IVF probe →
    MMR diversify — holds recall against full-dimension brute force.
    Each stage is individually graded elsewhere; this pins that the
    COMPOSITION doesn't silently lose it."""

    def test_pca_ivf_mmr_composition_recall(self, spark):
        from commerce_sessionization_spark.operators.ml import (
            pca_fit,
            pca_project,
        )
        from commerce_sessionization_spark.operators.similarity import (
            brute_force_topk,
            ivf_assign,
            ivf_search,
            kmeans_fit,
            mmr_rerank,
        )

        corpus = _planted_vectors(spark, n=400, d=16, noise_scale=0.05).cache()
        query = _planted_vectors(spark, n=401, d=16, noise_scale=0.05).filter(
            F.col("vec_id") == 400
        )
        truth = {
            r.vec_id
            for r in brute_force_topk(corpus, query, k=10).collect()
        }
        comps, mean, _ = pca_fit(corpus, k=4)
        pc = pca_project(
            corpus, comps, mean, out_col="embedding4", center=False
        ).select("vec_id", F.col("embedding4").alias("embedding"))
        pq = pca_project(
            query, comps, mean, out_col="embedding4", center=False
        ).select("vec_id", F.col("embedding4").alias("embedding"))
        cents = kmeans_fit(pc, k=8, max_iter=3)
        assigned = ivf_assign(pc, cents)
        hits = ivf_search(assigned, cents, pq, k=20, nprobe=4)
        got = {r.vec_id for r in hits.collect()}
        recall = len(truth & got) / len(truth)
        assert recall >= 0.8, recall

        cands = (
            hits.withColumn("query_id", F.lit(0))
            .join(pc.select("vec_id", "embedding"), "vec_id")
        )
        diverse = mmr_rerank(cands, k=5, lam=0.7).collect()
        assert len(diverse) == 5
        assert {r.vec_id for r in diverse} <= got
        assert sorted(r.mmr_rank for r in diverse) == [1, 2, 3, 4, 5]


class TestIVFSearchMany:
    def test_matches_looped_single_query_ivf(self, spark):
        from commerce_sessionization_spark.operators.similarity import (
            ivf_assign,
            ivf_search,
            ivf_search_many,
            kmeans_fit,
        )
        corpus = _planted_vectors(spark, n=300, d=8).cache()
        cents = kmeans_fit(corpus, k=6, max_iter=2)
        assigned = ivf_assign(corpus, cents).cache()
        queries = _planted_vectors(spark, n=305, d=8).filter(
            F.col("vec_id") >= 300
        ).withColumnRenamed("vec_id", "query_id")
        batched = {
            (r.query_id, r.vec_id)
            for r in ivf_search_many(
                assigned, cents, queries, k=7, nprobe=3
            ).collect()
        }
        looped = set()
        for qrow in queries.collect():
            one = spark.createDataFrame(
                [(qrow.embedding,)], "embedding array<float>"
            )
            for r in ivf_search(assigned, cents, one, k=7, nprobe=3).collect():
                looped.add((qrow.query_id, r.vec_id))
        assert batched == looped and len(batched) == 5 * 7

    def test_ivf_sq_exhaustive_probe_equals_sq_topk(self, spark):
        """ivf_sq_search_many at nprobe == nlist must reduce to plain
        sq_topk per query (the exhaustive-probe == brute-force grading
        identity the raw-cosine batcher pins above, on the compressed
        scoring path)."""
        from commerce_sessionization_spark.operators.similarity import (
            ivf_assign,
            ivf_sq_search_many,
            seed_centroids,
            sq_bounds,
            sq_encode,
            sq_topk,
        )

        corpus = _planted_vectors(spark, n=200, d=8).cache()
        cents = seed_centroids(corpus, nlist=5)
        bounds = sq_bounds(corpus, dim=8).localCheckpoint()
        coded = sq_encode(ivf_assign(corpus, cents), bounds)
        queries = corpus.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        qcoded = sq_encode(queries, bounds)
        batched = {
            (r.query_id, r.vec_id, r.sq_score)
            for r in ivf_sq_search_many(
                coded, cents, qcoded, k=6, nprobe=5
            ).collect()
        }
        looped = set()
        for qid in (0, 1):
            one = qcoded.filter(F.col("query_id") == qid)
            for r in sq_topk(coded, one, k=6).collect():
                looped.add((qid, r.vec_id, r.sq_score))
        assert batched == looped and len(batched) == 2 * 6

    def test_ivf_sq_prunes_unprobed_cells(self, spark):
        """At nprobe < nlist, no result may come from an unprobed cell —
        the pruning IS the compression story, so pin that it happens."""
        from commerce_sessionization_spark.operators.similarity import (
            ivf_assign,
            ivf_sq_search_many,
            seed_centroids,
            sq_bounds,
            sq_encode,
        )

        corpus = _planted_vectors(spark, n=200, d=8).cache()
        cents = seed_centroids(corpus, nlist=5)
        bounds = sq_bounds(corpus, dim=8).localCheckpoint()
        assigned = ivf_assign(corpus, cents)
        coded = sq_encode(assigned, bounds)
        queries = corpus.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        qcoded = sq_encode(queries, bounds)
        hits = ivf_sq_search_many(coded, cents, qcoded, k=50, nprobe=2)
        cell_of = {
            r.vec_id: r.centroid_id
            for r in assigned.select("vec_id", "centroid_id").collect()
        }
        hit_cells = {
            (r.query_id, cell_of[r.vec_id]) for r in hits.collect()
        }
        per_query_cells = {}
        for qid, cell in hit_cells:
            per_query_cells.setdefault(qid, set()).add(cell)
        for qid, cells in per_query_cells.items():
            assert len(cells) <= 2, (qid, cells)


class TestSufficientStatsLongSplit:
    """Round-11: the hi/lo long-split accumulation must be bit-identical
    to exact integer sums, negatives included, and the out-of-domain
    guard must raise instead of silently wrapping."""

    def test_exact_sums_with_negative_components(self, spark):
        from decimal import Decimal

        from commerce_sessionization_spark.operators.ml import (
            vector_sufficient_stats,
        )

        # components straddle 0 and approach the long-product domain at
        # scale 9 (|x| up to ~2.9), so products of both signs and
        # |hi| > 0 paths are all exercised
        vecs = [
            [-2.9, 1.7, -0.001],
            [0.33, -2.2, 2.8],
            [1.0, 0.0, -1.5],
            [-0.77, -0.88, 0.99],
        ]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
        )
        rows = vector_sufficient_stats(df).collect()
        got = {(r.i, r.j): int(r.s) for r in rows}
        import math

        q = [[math.floor(x * 1e9) for x in v] for v in vecs]
        d = 3
        assert got[(-1, -1)] == len(vecs)
        for i in range(1, d + 1):
            assert got[(i, -1)] == sum(r[i - 1] for r in q), i
            for j in range(i, d + 1):
                want = sum(r[i - 1] * r[j - 1] for r in q)
                assert got[(i, j)] == want, (i, j, got[(i, j)], want)

    def test_out_of_domain_vectors_take_exact_decimal_fallback(self, spark):
        import math

        from commerce_sessionization_spark.operators.ml import (
            vector_sufficient_stats,
        )

        # |x| = 8.6 > 3.03: products overflow a long at scale 9, so the
        # pre-scan must route to the decimal path — values still exact
        vecs = [[8.6, -7.9], [-4.4, 5.5]]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        rows = vector_sufficient_stats(df, dim=2).collect()
        got = {(r.i, r.j): int(r.s) for r in rows}
        q = [[math.floor(x * 1e9) for x in v] for v in vecs]
        for i in (1, 2):
            assert got[(i, -1)] == sum(r[i - 1] for r in q)
            for j in range(i, 3):
                assert got[(i, j)] == sum(r[i - 1] * r[j - 1] for r in q)


class TestPCAQuantizeScale:
    def test_quantize_scale_forwarded_and_grid_derived(self, spark):
        """ADVICE r8: pca_fit hardcoded grid=1e9 while the stats pass
        used its own default — changing the scale in one place would
        mis-scale mean and covariance. Fits at two scales must agree
        (up to quantization error), which only holds when the grid is
        derived from the forwarded scale."""
        from commerce_sessionization_spark.operators.ml import pca_fit

        df = _planted_vectors(spark, n=400, d=6)
        c9, m9, ev9 = pca_fit(df, k=3, quantize_scale=9)
        c6, m6, ev6 = pca_fit(df, k=3, quantize_scale=6)
        assert np.abs(m9 - m6).max() < 1e-4
        assert np.abs(ev9 - ev6).max() < 1e-4
        assert np.abs(c9 - c6).max() < 1e-3
