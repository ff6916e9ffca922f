"""Unit coverage for the north-star operator suites: dedup, similarity,
text analysis, multimodal plumbing — small inline fixtures, exact asserts
(the SURVEY §5 strategy applied to the added surface)."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from commerce_sessionization_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
    simhash_dedup_candidates,
    word_shingles,
)
from commerce_sessionization_spark.operators.similarity import (
    all_pairs_topk,
    brute_force_topk,
    embedding_dedup_pairs,
    ivf_assign,
    ivf_search,
    seed_centroids,
)
from commerce_sessionization_spark.operators.text import (
    language_id,
    quality_score,
    rolling_hash_fingerprint,
    with_fingerprint,
    with_text_stats,
)

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

LOREM = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to hide from all of the other animals"
)
LOREM_NEAR = LOREM.replace("green", "dark")  # one word of ~26 differs
LOREM_FAR = "completely different content about databases and query engines"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, LOREM),
        (2, LOREM),          # exact dup of 1
        (3, LOREM_NEAR),     # near dup of 1
        (4, LOREM_FAR),
        (5, "  " + LOREM.upper() + "  "),  # dup of 1 after normalization
        (6, "tiny"),         # fewer words than shingle width
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


class TestDedup:
    def test_exact_dedup_keeps_min_id_per_fingerprint(self, docs):
        kept = sorted(r.doc_id for r in exact_dedup(docs).collect())
        # 1≡2≡5 (case/whitespace-normalized) → keep 1; 3,4,6 unique
        assert kept == [1, 3, 4, 6]

    def test_exact_dedup_no_normalize_is_byte_exact(self, docs):
        kept = sorted(r.doc_id for r in exact_dedup(docs, normalize=False).collect())
        assert kept == [1, 3, 4, 5, 6]

    def test_ngram_jaccard_finds_near_dup(self, docs):
        pairs = {
            (r.a, r.b): r.jaccard
            for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
        assert (1, 3) in pairs and 0.5 < pairs[(1, 3)] < 1.0
        assert not any(4 in p for p in pairs)

    def test_jaccard_value_exact(self, spark):
        # hand-computable: shingle sets {a b c, b c d} vs {a b c} → J = 1/2
        df = spark.createDataFrame([(1, "a b c d"), (2, "a b c")], DOC_SCHEMA)
        [r] = ngram_jaccard_pairs(df, n=3, threshold=0.1).collect()
        assert (r.a, r.b, r.jaccard) == (1, 2, 0.5)

    @pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 0.95])
    def test_prefix_jaccard_matches_exhaustive(self, docs, threshold):
        exact = {
            (r.a, r.b, r.jaccard)
            for r in ngram_jaccard_pairs(docs, n=3, threshold=threshold).collect()
        }
        pf = {
            (r.a, r.b, r.jaccard)
            for r in prefix_jaccard_pairs(docs, n=3, threshold=threshold).collect()
        }
        assert pf == exact

    def test_prefix_jaccard_under_hot_shingle_skew(self, spark):
        # 40 docs share one boilerplate phrase (the naive join's 40²-pair
        # hot bucket); only the planted near-dup pair must survive, and
        # the prefix path must agree with brute force exactly.
        boiler = "click here to subscribe to our newsletter today"
        rows = [
            (i, f"{boiler} unique words number {i} body {i * 7} tail")
            for i in range(40)
        ]
        rows.append((100, rows[0][1]))  # exact dup of doc 0
        df = spark.createDataFrame(rows, DOC_SCHEMA)
        exact = {
            (r.a, r.b, r.jaccard)
            for r in ngram_jaccard_pairs(df, n=3, threshold=0.8).collect()
        }
        pf = {
            (r.a, r.b, r.jaccard)
            for r in prefix_jaccard_pairs(df, n=3, threshold=0.8).collect()
        }
        assert pf == exact
        assert (0, 100, 1.0) in pf

    def test_prefix_jaccard_ulp_boundary_pair_survives(self, spark):
        """Regression (ADVICE r8): 100·0.55 = 55.000000000000007 in
        doubles. Unguarded, (a) ceil overshoots to 56 so the 100-shingle
        doc's prefix shrinks to its 45 df=1 shingles (no shared shingle
        → candidate never generated), and (b) the length filter drops
        the (100, 55) size pair outright. The fixture is adversarial:
        doc B is a contiguous suffix of doc A, so A's 45 unique shingles
        (df=1) sort BEFORE all 55 shared ones (df=2) and only the
        correct prefix length 46 reaches a shared shingle. J is exactly
        55/100 = threshold."""
        uniq = " ".join(f"u{i:02d}" for i in range(45))
        shared = " ".join(f"bb{i:02d}" for i in range(57))
        df = spark.createDataFrame(
            [(1, f"{uniq} {shared}"), (2, shared)], DOC_SCHEMA
        )
        exact = {
            (r.a, r.b, r.jaccard)
            for r in ngram_jaccard_pairs(df, n=3, threshold=0.55).collect()
        }
        pf = {
            (r.a, r.b, r.jaccard)
            for r in prefix_jaccard_pairs(df, n=3, threshold=0.55).collect()
        }
        assert (1, 2, 0.55) in exact  # the fixture is at the boundary
        assert pf == exact

    def test_minhash_lsh_matches_exhaustive(self, docs):
        exact = {
            (r.a, r.b)
            for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
        }
        lsh = {
            (r.a, r.b)
            for r in minhash_lsh_dedup_pairs(
                docs, n=3, threshold=0.5, num_hashes=128, bands=64
            ).collect()
        }
        assert lsh == exact

    def test_lsh_candidates_prune_dissimilar(self, docs):
        cands = {
            (r.a, r.b)
            for r in minhash_lsh_candidates(
                docs, num_hashes=128, bands=16
            ).collect()
        }
        assert (1, 2) in cands          # identical docs always collide
        assert (1, 4) not in cands      # unrelated docs never share 8-row bands
        assert (2, 4) not in cands

    def test_simhash_candidates(self, docs):
        cands = {
            (r.a, r.b) for r in simhash_dedup_candidates(docs, n=2).collect()
        }
        assert (1, 2) in cands
        assert (1, 5) in cands  # normalization folds case/whitespace

    def test_word_shingles_short_doc(self, spark):
        df = spark.createDataFrame([(1, "only two")], DOC_SCHEMA)
        [r] = df.select(word_shingles(F.col("text"), 3).alias("s")).collect()
        assert r.s == []


EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [1.0, 0.02, 0.0]),
        (5, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, EMB_SCHEMA)


def cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


class TestSimilarity:
    def test_brute_force_topk_order_and_values(self, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        got = brute_force_topk(vectors, q, k=3).collect()
        assert [r.vec_id for r in got] == [0, 4, 1]
        assert got[1].cosine == pytest.approx(cos([1, 0, 0], [1.0, 0.02, 0.0]))

    def test_all_pairs_topk(self, vectors):
        queries = vectors.filter(F.col("vec_id").isin(0, 2)).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = all_pairs_topk(vectors, queries, k=2).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append(r.vec_id)
        assert by_q[0] == [0, 4]
        assert by_q[2] == [2, 1]

    def test_ivf_exhaustive_probe_equals_brute_force(self, vectors):
        cents = seed_centroids(vectors, nlist=3)
        assigned = ivf_assign(vectors, cents)
        q = vectors.filter(F.col("vec_id") == 0)
        ivf = [r.vec_id for r in ivf_search(assigned, cents, q, k=4, nprobe=3).collect()]
        bf = [r.vec_id for r in brute_force_topk(vectors, q, k=4).collect()]
        assert ivf == bf

    def test_ivf_narrow_probe_prunes(self, vectors):
        cents = seed_centroids(vectors, nlist=3)
        assigned = ivf_assign(vectors, cents)
        q = vectors.filter(F.col("vec_id") == 0)
        got = [r.vec_id for r in ivf_search(assigned, cents, q, k=6, nprobe=1).collect()]
        # probing 1 of 3 partitions cannot return the whole corpus
        assert 0 < len(got) < 6
        assert got[0] == 0

    def test_embedding_dedup_exhaustive_vs_bucketed(self, vectors):
        exact = {
            (r.a, r.b)
            for r in embedding_dedup_pairs(vectors, threshold=0.99, n_planes=0).collect()
        }
        bucketed = {
            (r.a, r.b)
            for r in embedding_dedup_pairs(
                vectors, threshold=0.99, n_planes=4, dim=3
            ).collect()
        }
        assert (0, 4) in exact
        assert (0, 5) not in exact  # opposite vectors
        # hyperplane buckets keep the very-high-cosine pair together
        assert (0, 4) in bucketed
        assert bucketed <= exact


class TestText:
    def test_counts_and_ratios(self, spark):
        df = spark.createDataFrame([(1, "The cat, and the dog!")], DOC_SCHEMA)
        [r] = with_text_stats(df).collect()
        assert r.char_count == 21
        assert r.word_count == 5
        assert r.token_count == 7  # the cat , and the dog !
        assert r.punct_ratio == pytest.approx(2 / 21)
        assert r.stopword_ratio == pytest.approx(3 / 5)  # the, and, the

    def test_quality_monotone_in_length(self, spark):
        df = spark.createDataFrame(
            [(1, "short text"), (2, "the " * 200)], DOC_SCHEMA
        )
        got = {r.doc_id: r.quality_score for r in quality_score(df).collect()}
        assert got[2] > got[1]

    def test_language_id(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat is in the house and it is happy"),
                (2, "der hund ist nicht in das haus und die katze"),
                (3, "le chat est dans la maison et les chiens"),
                (4, "el perro es una mascota que vive por los parques"),
                (5, "zzz qqq xxx"),
            ],
            DOC_SCHEMA,
        )
        got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
        assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}

    def test_fingerprint_normalization(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world"), (3, "other")], DOC_SCHEMA
        )
        fps = {r.doc_id: r.fingerprint for r in with_fingerprint(df).collect()}
        assert fps[1] == fps[2] != fps[3]
        assert fps[1] == hashlib.sha256(b"hello world").hexdigest()

    def test_rolling_hash_fingerprint_matches_for_dups(self, docs):
        fps = {
            r.doc_id: r.rolling_fp
            for r in rolling_hash_fingerprint(docs, window=8).collect()
        }
        assert fps[1] == fps[2]
        assert fps[1] != fps[4]


MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("content", BinaryType()),
        StructField("meta", StringType()),
    ]
)


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [
            (1, "image", b"\x89PNG fake bytes 1", "{}"),
            (2, "image", b"\x89PNG fake bytes 2", "{}"),
            (3, "audio", b"RIFF fake wav" * 100, "{}"),
            (4, "video", b"\x00\x00ftyp fake mp4" * 50, "{}"),
        ]
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_image_features_fake_decode(self, media):
        from commerce_sessionization_spark.operators.multimodal import (
            extract_image_features,
        )

        got = {r.asset_id: r for r in extract_image_features(media, fake=True).collect()}
        assert set(got) == {1, 2}
        for r in got.values():
            assert 64 <= r.width <= 255 and 64 <= r.height <= 255
            assert 0.0 <= r.mean_luma <= 1.0 and len(r.phash) == 16
        # deterministic: same payload → same features
        again = {r.asset_id: r for r in extract_image_features(media, fake=True).collect()}
        assert got == again

    def test_real_decode_rejects_formats_needing_codec_libs(self, media):
        from commerce_sessionization_spark.operators.multimodal import (
            extract_image_features,
        )

        # fixture payloads are PNG-ish bytes → real path must refuse loudly
        with pytest.raises(Exception, match="NotImplementedError|BMP"):
            extract_image_features(media, fake=False).collect()

    def test_real_bmp_decode_end_to_end(self, spark):
        import numpy as np

        from commerce_sessionization_spark.functions.codecs import encode_bmp
        from commerce_sessionization_spark.operators.multimodal import (
            extract_image_features,
        )

        dark = np.full((10, 20, 3), 10, dtype=np.uint8)
        light = np.full((32, 16, 3), 250, dtype=np.uint8)
        media = spark.createDataFrame(
            [
                (1, "image", bytes(encode_bmp(dark)), "{}"),
                (2, "image", bytes(encode_bmp(light)), "{}"),
                (3, "audio", b"not an image", "{}"),
            ],
            MEDIA_SCHEMA,
        )
        got = {r.asset_id: r for r in extract_image_features(media).collect()}
        assert set(got) == {1, 2}
        assert (got[1].width, got[1].height) == (20, 10)
        assert (got[2].width, got[2].height) == (16, 32)
        assert got[1].mean_luma == pytest.approx(10 / 255, abs=1e-6)
        assert got[2].mean_luma == pytest.approx(250 / 255, abs=1e-6)
        # flat images: no cell exceeds the grid mean → all-zero aHash
        assert got[1].phash == "0" * 16

    def test_real_png_decode_end_to_end(self, spark):
        import numpy as np

        from commerce_sessionization_spark.functions.codecs import (
            encode_bmp,
            encode_png,
        )
        from commerce_sessionization_spark.operators.multimodal import (
            extract_image_features,
        )

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(12, 18, 3), dtype=np.uint8)
        media = spark.createDataFrame(
            [
                (1, "image", bytes(encode_png(img, filter_type=4)), "{}"),
                (2, "image", bytes(encode_bmp(img)), "{}"),
            ],
            MEDIA_SCHEMA,
        )
        got = {r.asset_id: r for r in extract_image_features(media).collect()}
        # same pixels through either container → identical features
        assert (got[1].width, got[1].height) == (18, 12)
        assert got[1].mean_luma == got[2].mean_luma
        assert got[1].phash == got[2].phash

    def test_real_wav_decode_end_to_end(self, spark):
        import numpy as np

        from commerce_sessionization_spark.functions.codecs import encode_wav
        from commerce_sessionization_spark.operators.multimodal import (
            extract_audio_features,
        )

        quiet = 0.1 * np.sin(np.linspace(0, 200 * np.pi, 8000))  # 1 s @ 8 kHz
        loud = np.tile([0.8, -0.8], 22050)  # 2 s @ 22.05 kHz
        media = spark.createDataFrame(
            [
                (1, "audio", bytes(encode_wav(quiet, 8000)), "{}"),
                (2, "audio", bytes(encode_wav(loud, 22050)), "{}"),
            ],
            MEDIA_SCHEMA,
        )
        got = {r.asset_id: r for r in extract_audio_features(media).collect()}
        assert got[1].sample_rate == 8000
        assert got[1].duration_sec == pytest.approx(1.0)
        assert got[1].rms == pytest.approx(0.1 / 2**0.5, abs=1e-3)
        assert got[2].sample_rate == 22050
        assert got[2].duration_sec == pytest.approx(2.0)
        assert got[2].rms == pytest.approx(0.8, abs=1e-3)

    def test_audio_and_video(self, media):
        from commerce_sessionization_spark.operators.multimodal import (
            extract_audio_features,
            sample_video_frames,
        )

        [a] = extract_audio_features(media, fake=True).collect()
        assert a.asset_id == 3 and a.sample_rate == 16000 and a.duration_sec > 0
        frames = sample_video_frames(media, fake=True).collect()
        assert frames and all(f.asset_id == 4 for f in frames)
        assert len({f.frame_idx for f in frames}) == len(frames)

    def test_metadata_stats_no_decode(self, media):
        from commerce_sessionization_spark.operators.multimodal import (
            media_metadata_stats,
        )

        got = {r.modality: r.n_assets for r in media_metadata_stats(media).collect()}
        assert got == {"image": 2, "audio": 1, "video": 1}


class TestKMeans:
    def test_converges_on_separated_clusters(self, spark):
        from commerce_sessionization_spark.operators.similarity import (
            brute_force_topk,
            ivf_assign,
            ivf_search,
            kmeans_fit,
        )

        import random

        rng = random.Random(7)
        rows = []
        centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
        for i in range(90):
            c = centers[i % 3]
            rows.append(
                (i, [x + rng.uniform(-0.5, 0.5) for x in c])
            )
        df = spark.createDataFrame(rows, EMB_SCHEMA)
        cents = kmeans_fit(df, k=3, max_iter=8)
        assigned = ivf_assign(df, cents)
        # every true cluster maps to exactly one learned centroid
        m = (
            assigned.withColumn("truth", F.col("vec_id") % 3)
            .groupBy("truth")
            .agg(F.countDistinct("centroid_id").alias("n"))
            .collect()
        )
        assert all(r.n == 1 for r in m)
        # and IVF search with learned centroids, exhaustive probe == brute force
        q = df.filter(F.col("vec_id") == 0)
        ivf = [r.vec_id for r in ivf_search(assigned, cents, q, k=5, nprobe=3).collect()]
        bf = [r.vec_id for r in brute_force_topk(df, q, k=5).collect()]
        assert ivf == bf

    def test_deterministic(self, spark, vectors):
        from commerce_sessionization_spark.operators.similarity import kmeans_fit

        a = sorted(map(tuple, kmeans_fit(vectors, k=2, max_iter=4).collect()))
        b = sorted(map(tuple, kmeans_fit(vectors, k=2, max_iter=4).collect()))
        assert a == b


class TestDedupComponents:
    def test_transitive_clusters_and_singletons(self, spark):
        from commerce_sessionization_spark.operators.dedup import dedup_components

        # chain 1-2-3 (transitive), pair 5-6, singletons 4,7
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], "a long, b long"
        )
        ids = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
        got = {
            r.doc_id: r.component_id
            for r in dedup_components(pairs, ids).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}

    def test_long_chain_converges(self, spark):
        from commerce_sessionization_spark.operators.dedup import dedup_components

        n = 12
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, n)], "a long, b long"
        )
        ids = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
        got = {
            r.doc_id: r.component_id
            for r in dedup_components(pairs, ids).collect()
        }
        assert set(got.values()) == {1}


def test_segment_dedup_strips_cross_doc_boilerplate(spark):
    from commerce_sessionization_spark.operators.dedup import segment_dedup

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nunique alpha line\nfooter text"),
            (2, "COOKIE BANNER\nunique beta line\nfooter text"),
            (3, "only original content here"),
            (4, "COOKIE BANNER\nfooter text"),  # pure boilerplate
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for r in segment_dedup(docs, min_docs=2).collect()
    }
    # shared lines dropped everywhere, unique lines kept in order
    assert out[1] == ("unique alpha line", 1)
    assert out[2] == ("unique beta line", 1)
    # untouched doc keeps its full text
    assert out[3] == ("only original content here", 1)
    # all-boilerplate doc survives as an empty row, not a missing row
    assert out[4] == ("", 0)


def test_segment_dedup_min_docs_threshold(spark):
    from commerce_sessionization_spark.operators.dedup import segment_dedup

    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc"), (3, "a\nd")], ["doc_id", "text"]
    )
    # min_docs=4: nothing reaches the threshold, all text survives
    out = {
        r["doc_id"]: r["clean_text"]
        for r in segment_dedup(docs, min_docs=4).collect()
    }
    assert out == {1: "a\nb", 2: "a\nc", 3: "a\nd"}


def test_hash_split_deterministic_and_proportional(spark):
    from commerce_sessionization_spark.operators.sampling import hash_split

    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert a == b  # no rand() state: identical across runs
    from collections import Counter

    c = Counter(a.values())
    assert 0.88 < c["train"] / 20_000 < 0.92
    assert 0.04 < c["val"] / 20_000 < 0.06
    assert 0.04 < c["test"] / 20_000 < 0.06
    # join-stability: a subset splits identically to the whole
    sub = {r["doc_id"]: r["split"] for r in hash_split(df.limit(1000)).collect()}
    assert all(a[k] == v for k, v in sub.items())


def test_real_gif_frame_sampling_end_to_end(spark):
    import numpy as np

    from commerce_sessionization_spark.functions.codecs import encode_gif
    from commerce_sessionization_spark.operators.multimodal import (
        sample_video_frames,
    )

    clip_a = [np.full((4, 6), v, np.uint8) for v in (1, 2, 3, 4, 5)]
    clip_b = [np.full((8, 8), v, np.uint8) for v in (7, 7)]  # identical frames
    media = spark.createDataFrame(
        [
            (1, "video", bytes(encode_gif(clip_a)), "{}"),
            (2, "video", bytes(encode_gif(clip_b)), "{}"),
            (3, "image", b"not a gif", "{}"),
        ],
        "asset_id long, modality string, content binary, meta string",
    )
    got = sample_video_frames(media, every_n=2, max_frames=8).collect()
    by_asset: dict = {}
    for r in got:
        by_asset.setdefault(r.asset_id, []).append(r)
    # every 2nd of 5 frames: indexes 0, 2, 4
    assert sorted(r.frame_idx for r in by_asset[1]) == [0, 2, 4]
    # distinct content -> distinct fingerprints
    assert len({r.frame_phash for r in by_asset[1]}) == 3
    # identical frames -> identical fingerprint
    assert len({r.frame_phash for r in by_asset[2]}) == 1
    # real path refuses non-GIF video payloads loudly
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(9, "video", b"\x00\x00mp4ftyp", "{}")],
        "asset_id long, modality string, content binary, meta string",
    )
    with _pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        sample_video_frames(bad).collect()


def test_incremental_dedup_skips_seen_and_batch_dupes(spark):
    from commerce_sessionization_spark.operators.dedup import (
        incremental_exact_dedup,
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta"),
            (11, "alpha beta"),      # in-batch dupe -> min id 10 kept
            (12, "ALREADY SEEN"),    # matches history -> dropped
            (13, "fresh text"),
        ],
        "doc_id long, text string",
    )
    history = spark.createDataFrame(
        [("already seen",)], "t string"
    ).select(F.sha2(F.regexp_replace(F.lower(F.trim("t")), r"\s+", " "), 256).alias("content_sha"))
    kept = incremental_exact_dedup(batch, history)
    assert sorted(r.doc_id for r in kept.collect()) == [10, 13]
    # idempotency: append kept hashes to the index, re-run same batch -> empty
    new_index = history.unionByName(kept.select("content_sha"))
    again = incremental_exact_dedup(batch, new_index)
    assert again.count() == 0


def test_ols_recovers_a_perfect_line(spark):
    """y = 3x + 7 daily sums -> slope_q6 == 3_000_000, intercept_q4 == 70_000."""
    import datetime

    from commerce_sessionization_spark.plans.queries import q_revenue_trend_ols

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for d in range(10):
        x = (base + datetime.timedelta(days=d) - datetime.datetime(1970, 1, 1)).days
        rows.append((d, base + datetime.timedelta(days=d), 1, "buy", float(3 * x + 7), "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        out = q_revenue_trend_ols(spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_days, r.slope_q6, r.intercept_q4) == (10, 3_000_000, 70_000)


def test_cusum_flags_level_shift_not_flat_series(spark, tmp_path):
    """The CUSUM alarm query's formulation (n-scaled exact decimals) must
    fire after a planted level shift and stay silent on a flat series.
    Uses the same arithmetic as q_revenue_cusum_alarms on a crafted
    orders table."""
    from commerce_sessionization_spark.plans.queries import (
        q_revenue_cusum_alarms,
    )
    import datetime

    rows = []
    # priority A: flat 100/day for 40 days -> no drift
    for i in range(40):
        rows.append((i, 1, "O", 100.0,
                     datetime.date(2024, 1, 1) + datetime.timedelta(i), "A"))
    # priority B: 100/day for 20 days then 300/day for 20 -> upward shift
    for i in range(40):
        rows.append((1000 + i, 1, "O", 100.0 if i < 20 else 300.0,
                     datetime.date(2024, 1, 1) + datetime.timedelta(i), "B"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    import glob
    import shutil

    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/tmp")
    part = glob.glob(f"{d}/tmp/part-*.parquet")[0]
    shutil.copy(part, f"{d}/orders.parquet")
    out = q_revenue_cusum_alarms(spark, d).collect()
    prios = {r.o_orderpriority for r in out}
    assert "B" in prios and "A" not in prios, out
    # alarms begin after the shift, never before day 21
    assert min(r.d for r in out if r.o_orderpriority == "B") > \
        datetime.date(2024, 1, 21)


class TestSmootherKeyTypes:
    def test_exp_smooth_long_series_key(self, spark):
        """Round-9 audit fix: the smoothers hardcoded `series string` in
        their applyInPandas schema — a bigint series key failed. Types
        now follow the input schema."""
        from commerce_sessionization_spark.operators.timeseries import (
            exp_smooth,
            holt_smooth,
        )
        df = spark.createDataFrame(
            [(7, 0, 100), (7, 1, 200), (7, 2, 300)],
            "series long, idx long, v_micro long",
        )
        out = exp_smooth(
            df, series_col="series", idx_col="idx",
            value_micro_col="v_micro",
        ).orderBy("idx").collect()
        assert [r.series for r in out] == [7, 7, 7]
        assert dict(exp_smooth(
            df, series_col="series", idx_col="idx",
            value_micro_col="v_micro",
        ).dtypes)["series"] == "bigint"
        h = holt_smooth(
            df, series_col="series", idx_col="idx",
            value_micro_col="v_micro",
        ).orderBy("idx").collect()
        assert [r.series for r in h] == [7, 7, 7]
