"""Corpus-hygiene operators: decontamination, repetition signals, PII
scrubbing, and the bloom membership filter.

The DuckDB oracle (tools/check_oracle.py) covers cross-engine value
parity on the testdata; these tests pin the operator *semantics* on
crafted inputs the synthetic corpus can't produce — real PII strings,
known repetition structure, bloom guarantee laws.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.decontam import (
    decontaminate,
    ngram_contamination,
)
from commerce_sessionization_spark.operators.sketches import (
    bloom_bits,
    bloom_contains,
)
from commerce_sessionization_spark.operators.text import pii_scrub, repetition_scores


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


# --------------------------------------------------------------------------
# Decontamination
# --------------------------------------------------------------------------

def test_contamination_flags_shared_ngrams_only(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words appear in this one here"),
        ],
    )
    bench = _docs(spark, [(100, "quick brown fox jumps somewhere else entirely")])
    out = ngram_contamination(train, bench, n=4).collect()
    assert {r["doc_id"] for r in out} == {1}
    # "quick brown fox jumps" is the single shared 4-gram
    assert out[0]["n_contaminated_ngrams"] == 1


def test_decontaminate_drops_flagged_docs(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words appear in this one here"),
        ],
    )
    bench = _docs(spark, [(100, "quick brown fox jumps somewhere else entirely")])
    kept = decontaminate(train, bench, n=4).select("doc_id").collect()
    assert {r["doc_id"] for r in kept} == {2}


def test_contamination_is_case_and_whitespace_normalized(spark):
    train = _docs(spark, [(1, "  The   QUICK brown FOX jumps ")])
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    assert ngram_contamination(train, bench, n=4).count() == 1


# --------------------------------------------------------------------------
# Repetition signals
# --------------------------------------------------------------------------

def test_repetition_scores_known_structure(spark):
    # "a a a b": words 4, distinct 2 → dup_word 0.5; top word "a" 3/4;
    # 2-grams [a a, a a, a b]: 3 total 2 distinct → 1/3 dup
    df = _docs(spark, [(1, "a a a b")])
    r = repetition_scores(df).collect()[0]
    assert r["dup_word_frac"] == pytest.approx(0.5)
    assert r["top_word_frac"] == pytest.approx(0.75)
    assert r["dup_2gram_frac"] == pytest.approx(1 / 3)
    assert r["dup_3gram_frac"] == pytest.approx(0.0)


def test_repetition_scores_all_unique_words(spark):
    df = _docs(spark, [(7, "one two three four five")])
    r = repetition_scores(df).collect()[0]
    assert r["dup_word_frac"] == 0.0
    assert r["top_word_frac"] == pytest.approx(0.2)
    assert r["dup_2gram_frac"] == 0.0


def test_repetition_scores_short_doc_fills_zero(spark):
    # single word: no 2-grams/3-grams → filled 0.0, not null/missing
    r = repetition_scores(_docs(spark, [(3, "hello")])).collect()[0]
    assert r["dup_2gram_frac"] == 0.0 and r["dup_3gram_frac"] == 0.0
    assert r["top_word_frac"] == 1.0


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

def test_pii_scrub_redacts_real_pii(spark):
    df = _docs(
        spark,
        [
            (
                1,
                "mail alice.smith+test@sub.example.co.uk or bob@x.io, "
                "server 192.168.1.254, call 555-867-5309 now",
            )
        ],
    )
    r = pii_scrub(df).collect()[0]
    assert r["n_emails"] == 2 and r["n_ips"] == 1 and r["n_phones"] == 1
    s = r["scrubbed"]
    assert "<EMAIL>" in s and "<IP>" in s and "<PHONE>" in s
    assert "alice" not in s and "192.168" not in s and "867" not in s


def test_pii_scrub_clean_text_is_identity(spark):
    txt = "no sensitive content in this perfectly ordinary sentence"
    r = pii_scrub(_docs(spark, [(1, txt)])).collect()[0]
    assert r["scrubbed"] == txt
    assert r["n_emails"] == r["n_ips"] == r["n_phones"] == 0


def test_pii_scrub_email_counted_once_not_as_phone_or_ip(spark):
    # digits+dots inside an email must not double-count after redaction
    r = pii_scrub(_docs(spark, [(1, "x 10.20.30.40@example.com y")])).collect()[0]
    assert r["n_emails"] == 1 and r["n_ips"] == 0 and r["n_phones"] == 0


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------

def test_bloom_no_false_negatives(spark):
    members = spark.range(0, 200).select(F.col("id").alias("k"))
    bits = bloom_bits(members, "k")
    probed = bloom_contains(members, "k", bits)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_bits_bounded_by_m(spark):
    members = spark.range(0, 5000).select(F.col("id").alias("k"))
    assert bloom_bits(members, "k", m=256, k=3).count() <= 256


def test_bloom_union_merge_law(spark):
    # bits(A ∪ B) == bits(A) ∪ bits(B): sketch state is mergeable
    a = spark.range(0, 50).select(F.col("id").alias("k"))
    b = spark.range(40, 90).select(F.col("id").alias("k"))
    merged = bloom_bits(a, "k").union(bloom_bits(b, "k")).distinct()
    direct = bloom_bits(a.union(b), "k")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_bloom_false_positive_rate_reasonable(spark):
    members = spark.range(0, 100).select(F.col("id").alias("k"))
    strangers = spark.range(100_000, 101_000).select(F.col("id").alias("k"))
    bits = bloom_bits(members, "k", m=1024, k=3)
    fp = (
        bloom_contains(strangers, "k", bits, m=1024, k=3)
        .filter(F.col("bloom_hit"))
        .count()
    )
    # fill ≈ 1-e^(-300/1024) ≈ 0.254 → fp ≈ 1.6%; allow generous slack
    assert fp < 100


def test_pii_scrub_works_on_streams_unchanged(spark, tmp_path):
    """The scrub is stateless column expressions, so the SAME operator
    runs on a readStream frame — batch/stream unification for the
    hygiene surface."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(
        [(1, "write to alice@example.com today"), (2, "clean text")], schema
    ).coalesce(1).write.parquet(str(src / "d0.parquet"))

    stream = spark.readStream.schema(schema).parquet(f"{src}/d*.parquet")
    q = (
        pii_scrub(stream)
        .writeStream.format("memory")
        .queryName("scrub_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["doc_id"]: r for r in spark.sql("SELECT * FROM scrub_sink").collect()}
    assert rows[1]["n_emails"] == 1 and "<EMAIL>" in rows[1]["scrubbed"]
    assert rows[2]["n_emails"] == 0 and rows[2]["scrubbed"] == "clean text"


def test_cross_doc_span_stats_crafted(spark):
    """Two docs share one 8-gram; a third is unique; a short doc is skipped."""
    from commerce_sessionization_spark.operators.text import (
        cross_doc_span_stats,
    )

    shared = "a b c d e f g h"  # exactly 8 words -> 1 span
    rows = [
        (1, shared + " x y"),          # spans: 3, one of them == shared
        (2, "p q " + shared),          # spans: 3, one of them == shared
        (3, "u v w x y z aa bb cc"),   # 2 spans, none shared
        (4, "too short"),              # < 8 words -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in cross_doc_span_stats(df, window=8).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1].n_spans, out[1].n_dup_spans) == (3, 1)
    assert (out[2].n_spans, out[2].n_dup_spans) == (3, 1)
    assert (out[3].n_spans, out[3].n_dup_spans) == (2, 0)
    assert out[1].dup_ratio_q6 == 333_333
    assert out[3].dup_ratio_q6 == 0


def test_augment_word_dropout_rate_determinism_and_identity(spark):
    from commerce_sessionization_spark.operators.text import (
        augment_word_dropout,
    )

    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(200))) for i in range(50)],
        "doc_id long, text string",
    )
    out1 = augment_word_dropout(df, rate=0.1, seed="s1").collect()
    out2 = augment_word_dropout(df, rate=0.1, seed="s1").collect()
    assert [r.text_aug for r in out1] == [r.text_aug for r in out2]
    # ~10% dropped over 10k words (hash-uniform, not exact per doc)
    kept = sum(len(r.text_aug.split(" ")) for r in out1)
    assert 0.85 * 10_000 < kept < 0.95 * 10_000
    # kept words preserve relative order and come from the original
    r0 = next(r for r in out1 if r.doc_id == 0)
    idxs = [int(w[1:]) for w in r0.text_aug.split(" ")]
    assert idxs == sorted(idxs) and len(set(idxs)) == len(idxs)
    # a different seed drops a different subset
    out3 = augment_word_dropout(df, rate=0.1, seed="s2").collect()
    assert [r.text_aug for r in out3] != [r.text_aug for r in out1]
    # rate 0 is the identity (modulo whitespace normalization)
    ident = augment_word_dropout(df, rate=0.0, seed="s1").collect()
    assert all(r.text_aug == r.text for r in ident)


def test_augment_fast_mode_same_contract_cheaper_hash(spark):
    from commerce_sessionization_spark.operators.text import (
        augment_word_dropout,
    )

    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(200))) for i in range(50)],
        "doc_id long, text string",
    )
    f1 = augment_word_dropout(df, rate=0.1, seed="s1", fast=True).collect()
    f2 = augment_word_dropout(df, rate=0.1, seed="s1", fast=True).collect()
    assert [r.text_aug for r in f1] == [r.text_aug for r in f2]
    kept = sum(len(r.text_aug.split(" ")) for r in f1)
    assert 0.85 * 10_000 < kept < 0.95 * 10_000
    r0 = next(r for r in f1 if r.doc_id == 0)
    idxs = [int(w[1:]) for w in r0.text_aug.split(" ")]
    assert idxs == sorted(idxs) and len(set(idxs)) == len(idxs)


def test_clean_text_strips_controls_collapses_ws_lowercases(spark):
    from pyspark.sql import Row

    from commerce_sessionization_spark.operators.text import clean_text

    df = spark.createDataFrame(
        [
            Row(text="Hello\tWorld\n\nFOO\x00bar  \x1f  Baz  "),
            Row(text="  already clean  "),
            Row(text=""),
        ]
    )
    got = [r.text_clean for r in clean_text(df).collect()]
    assert got[0] == "hello world foobar baz"
    assert got[1] == "already clean"
    assert got[2] == ""


def test_clean_text_is_idempotent_and_shrinks(spark):
    from pyspark.sql import functions as F

    from commerce_sessionization_spark.operators.text import clean_text
    from commerce_sessionization_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select("text")
    once = clean_text(docs)
    twice = clean_text(once.select(F.col("text_clean").alias("text")))
    assert once.filter(
        F.length("text_clean") > F.length("text")
    ).count() == 0
    a = [r.text_clean for r in once.orderBy(F.col("text_clean")).collect()]
    b = [r.text_clean for r in twice.orderBy(F.col("text_clean")).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# HTML → text extraction


def test_strip_html_all_removal_classes(spark):
    from commerce_sessionization_spark.operators.text import strip_html

    html = (
        '<html><!-- hidden comment --><head><style>p { margin: 0 }</style>'
        '<title>T1</title></head><body><script type="x">var a = "<p>leak";'
        "</script><h1>Hello &amp; welcome</h1><p>line one</p>"
        "<p>l&lt;2&gt; &quot;q&#39;s&nbsp;end</p>"
        '<a href="/x">Next</a>tail</body></html>'
    )
    df = spark.createDataFrame(
        [(1, html), (2, "plain no markup"), (3, "")], ["doc_id", "html"]
    )
    out = {r["doc_id"]: r["text"] for r in strip_html(df).collect()}
    # comment/script/style content is GONE (no "leak"), tags become word
    # boundaries, entities decode, whitespace collapses
    assert out[1] == "T1 Hello & welcome line one l<2> \"q's end Next tail"
    assert out[2] == "plain no markup"  # non-HTML passes through
    assert out[3] == ""


def test_strip_html_amp_decoded_last(spark):
    from commerce_sessionization_spark.operators.text import strip_html

    # double-encoded &amp;lt; must yield the literal "&lt;", not "<"
    df = spark.createDataFrame([(1, "a &amp;lt; b")], ["doc_id", "html"])
    assert strip_html(df).first()["text"] == "a &lt; b"


def test_html_features_link_density(spark):
    from commerce_sessionization_spark.operators.text import html_features

    nav = '<a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a>'
    article = "<p>" + "word " * 50 + '</p><a href="/next">next</a>'
    df = spark.createDataFrame(
        [(1, nav), (2, article)], ["doc_id", "html"]
    )
    out = {r["doc_id"]: r.asDict() for r in html_features(df).collect()}
    # anchor text is 11 of 13 visible chars (separator spaces are not
    # link text): unmistakably navigation chrome
    assert out[1]["link_density"] > 0.8
    assert out[2]["link_density"] < 0.1  # article body dominates
    assert out[1]["tag_count"] == 6 and out[1]["script_count"] == 0
    assert out[2]["link_text_len"] == len("next")


def test_strip_html_stays_jvm_side(spark):
    from commerce_sessionization_spark.operators.text import (
        html_features,
        strip_html,
    )

    df = spark.createDataFrame([(1, "<p>x</p>")], ["doc_id", "html"])
    for plan_df in (strip_html(df), html_features(df)):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Encoding quality + readability


def test_encoding_quality_counts_each_artifact_class(spark):
    from commerce_sessionization_spark.operators.text import encoding_quality

    mangled = (
        "Cl\u00c3\u00a9ment said \u00e2\u20ac\u0153hello"
        "\u00e2\u20ac\u00a6 and left\ufffd now\x01"
    )
    df = spark.createDataFrame(
        [(1, "The cat sat. Clean text."), (2, mangled), (3, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in encoding_quality(df).collect()}
    assert out[1]["encoding_ok"] is True
    assert out[2]["mojibake_count"] == 3  # \u00c3\u00a9 + 2 smart-quote mangles
    assert out[2]["replacement_count"] == 1
    assert out[2]["control_count"] == 1
    assert out[2]["encoding_ok"] is False
    assert out[3]["encoding_ok"] is True  # empty is clean, not an error


def test_readability_flesch_known_values(spark):
    from commerce_sessionization_spark.operators.text import readability

    df = spark.createDataFrame(
        [
            (1, "The cat sat. It ran! Done?"),
            (2, "no punctuation here at all"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in readability(df).collect()}
    # 6 words, 3 sentences, 7 vowel groups
    assert out[1]["word_count_rd"] == 6
    assert out[1]["sentence_count"] == 3
    assert out[1]["syllable_count"] == 7
    expected = 206.835 - 1.015 * (6 / 3) - 84.6 * (7 / 6)
    assert out[1]["flesch"] == pytest.approx(expected)
    assert out[2]["sentence_count"] == 1  # implicit sentence, never /0
    assert out[3]["flesch"] == 0.0  # empty doc defined as 0


def test_encoding_readability_stay_jvm_side(spark):
    from commerce_sessionization_spark.operators.text import (
        encoding_quality,
        readability,
    )

    df = spark.createDataFrame([(1, "x. y")], ["doc_id", "text"])
    for plan_df in (encoding_quality(df), readability(df)):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Per-block boilerplate removal


def test_boilerplate_keeps_article_drops_chrome(spark):
    from commerce_sessionization_spark.operators.text import (
        remove_boilerplate,
    )

    article = (
        "This is the actual article content of the page and it talks "
        "about a subject at length with many common words in the text."
    )
    html = (
        '<html><body><nav><a href="/">Home</a> | <a href="/a">About</a>'
        ' | <a href="/l">Login</a></nav>'
        f"<p>{article}</p>"
        "<div>Cookie notice accept decline</div>"
        '<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>'
        "</body></html>"
    )
    r = remove_boilerplate(
        spark.createDataFrame([(1, html)], ["doc_id", "html"])
    ).first()
    assert r["content"] == article
    assert r["n_blocks_kept"] == 1
    assert r["n_blocks_total"] == 4  # nav, article, banner, footer


def test_boilerplate_script_content_never_counts(spark):
    from commerce_sessionization_spark.operators.text import (
        remove_boilerplate,
    )

    # a long script with prose-like density must NOT survive as a block
    script = "var the = 1; " * 20
    html = f"<p><script>{script}</script></p>"
    r = remove_boilerplate(
        spark.createDataFrame([(1, html)], ["doc_id", "html"])
    ).first()
    assert r["content"] == "" and r["n_blocks_kept"] == 0


def test_boilerplate_link_density_threshold(spark):
    from commerce_sessionization_spark.operators.text import (
        remove_boilerplate,
    )

    # a long block that is mostly anchor text is chrome even when wordy
    links = " ".join(
        f'<a href="/{i}">the product category number {i} is here</a>'
        for i in range(5)
    )
    r = remove_boilerplate(
        spark.createDataFrame([(1, f"<div>{links}</div>")], ["d", "html"]),
    ).first()
    assert r["n_blocks_kept"] == 0


def test_boilerplate_stays_jvm_side_and_shuffle_free(spark):
    from commerce_sessionization_spark.operators.text import (
        remove_boilerplate,
    )

    df = spark.createDataFrame([(1, "<p>x</p>")], ["doc_id", "html"])
    plan = (
        remove_boilerplate(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure scan -> project


# ---------------------------------------------------------------------------
# Gopher quality gates


def test_gopher_rules_fire_individually(spark):
    from commerce_sessionization_spark.operators.text import (
        gopher_quality_flags,
    )

    prose = (
        "The project is one of the larger efforts and we have worked "
        "with the team to deliver that outcome for everyone involved. "
    ) * 5
    rows = [
        (1, prose),  # passes everything
        (2, "short text"),  # word count + stopwords fail
        (3, "\n".join("- item" for _ in range(10))),  # bullets fail
        (4, "#### " * 60 + prose),  # symbol ratio fails
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_flags(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[1]["gopher_pass"] is True
    assert out[2]["ok_word_count"] is False
    assert out[2]["gopher_pass"] is False
    assert out[3]["ok_bullets"] is False
    assert out[4]["ok_symbol_ratio"] is False
    # the audit shape: a failing doc still reports which rules it passed
    assert out[4]["ok_word_count"] is True


def test_gopher_flags_stay_jvm_side(spark):
    from commerce_sessionization_spark.operators.text import (
        gopher_quality_flags,
    )

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = (
        gopher_quality_flags(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_c4_line_filters_semantics(spark):
    from commerce_sessionization_spark.operators.text import c4_line_filters

    page = (
        "This is a proper sentence that ends well.\n"
        "menu home about\n"
        "Another good line with enough words here!\n"
        "short one."
    )
    rows = [
        (1, page),
        (2, "Lorem Ipsum dolor sit amet something here."),
        (3, "var x = { a: 1 } plus some prose after it."),
        (4, ""),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in c4_line_filters(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[1]["text_c4"] == (
        "This is a proper sentence that ends well.\n"
        "Another good line with enough words here!"
    )
    assert (out[1]["n_lines_kept"], out[1]["n_lines_total"]) == (2, 4)
    assert out[1]["c4_keep"] is True
    assert out[2]["c4_keep"] is False  # lorem ipsum page gate
    assert out[3]["c4_keep"] is False  # curly brace page gate
    assert out[4]["c4_keep"] is False  # nothing survives -> drop page


def test_c4_filters_stay_jvm_side(spark):
    from commerce_sessionization_spark.operators.text import c4_line_filters

    df = spark.createDataFrame([(1, "x.")], ["doc_id", "text"])
    plan = c4_line_filters(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


class TestSemanticContamination:
    def test_max_cosine_and_flag(self, spark):
        """Hand-computable: train vec [1,0] vs bench {[1,0],[0,1]} has
        max cos 1.0 (contaminated at tau=0.9); [0.6,0.8] has max cos
        0.8 (clean); orthogonal-ish [−1,0]... use [0,1]-free bench."""
        from commerce_sessionization_spark.operators.decontam import (
            semantic_contamination,
        )
        bench = spark.createDataFrame(
            [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        train = spark.createDataFrame(
            [(1, [2.0, 0.0]), (2, [0.6, 0.8]), (3, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        got = {
            r.vec_id: (round(r.max_cos, 9), r.contaminated)
            for r in semantic_contamination(train, bench, tau=0.9).collect()
        }
        assert got[1] == (1.0, True)       # same direction, scaled
        assert got[2] == (0.6, False)      # cos = 0.6/1
        assert got[3] == (0.0, False)      # orthogonal
        assert len(got) == 3               # one row per train vector

    def test_empty_benchmark_raises(self, spark):
        """ADVICE r9: an empty benchmark split must fail loudly — the
        crossJoin would otherwise drop every train row and a
        decontamination gate would pass with zero coverage."""
        import pytest

        from commerce_sessionization_spark.operators.decontam import (
            semantic_contamination,
        )
        bench = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        train = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="zero coverage"):
            semantic_contamination(train, bench, tau=0.9)


class TestUnigramLogprob:
    def test_exact_quantized_sums(self, spark):
        """Corpus 'a a b' ⇒ p(a)=2/3, p(b)=1/3. Doc1='a a' ⇒ lp_qsum =
        2·floor(ln(2/3)·1e9); doc2='b' ⇒ floor(ln(1/3)·1e9); means
        divide exactly."""
        import math

        from commerce_sessionization_spark.operators.text import (
            unigram_logprob,
        )
        df = spark.createDataFrame(
            [(1, "a a"), (2, "b")], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_tokens, r.lp_qsum, r.logprob)
            for r in unigram_logprob(df).collect()
        }
        qa = math.floor(math.log(2 / 3) * 1e9)
        qb = math.floor(math.log(1 / 3) * 1e9)
        assert got[1] == (2, 2 * qa, 2 * qa / 2 / 1e9)
        assert got[2] == (1, qb, qb / 1 / 1e9)

    def test_order_independence_is_structural(self, spark):
        """The per-doc sum is over exact BIGINTs, so repartitioning the
        corpus cannot move the result (the hazard the design removes)."""
        from commerce_sessionization_spark.operators.text import (
            unigram_logprob,
        )
        rows = [(i, f"tok{i % 7} tok{i % 3} common") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = {(r.doc_id, r.lp_qsum) for r in unigram_logprob(df).collect()}
        b = {
            (r.doc_id, r.lp_qsum)
            for r in unigram_logprob(df.repartition(13)).collect()
        }
        assert a == b
