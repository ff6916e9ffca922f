"""exact_substring_dedup: token-level cross-document duplicate-span
removal (the ExactSubstr tier of training-data dedup).

The k-shingle formulation must EQUAL the declarative semantics "remove
every word position covered by a duplicated >=window-token substring" —
these tests pin that equality on hand-built corpora plus the structural
laws (subsequence preservation, count law, short-doc passthrough,
docs-vs-occurrences mode split).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.dedup import exact_substring_dedup


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out(df):
    return {
        r["doc_id"]: (r["clean_text"], r["n_words"], r["n_kept"])
        for r in df.collect()
    }


WORDS = [f"w{i}" for i in range(30)]


def test_shared_run_removed_from_both_docs(spark):
    # docs 1 and 2 share an exact 10-word run; window=8 marks positions
    # covered by any duplicated 8-gram — i.e. the full 10-word run in
    # both docs, and nothing else.
    shared = " ".join(WORDS[:10])
    a = "alpha beta " + shared + " gamma"
    b = "delta " + shared + " epsilon zeta"
    out = _out(exact_substring_dedup(_mk(spark, [(1, a), (2, b)]), window=8))
    assert out[1] == ("alpha beta gamma", 13, 3)
    assert out[2] == ("delta epsilon zeta", 13, 3)


def test_overlapping_grams_merge_into_maximal_span(spark):
    # the duplicated region is longer than the window: overlapping
    # duplicated 4-grams must union into one maximal removed span with
    # no survivor islands inside it.
    shared = " ".join(WORDS[:9])
    a = "x1 " + shared + " x2"
    b = shared
    out = _out(exact_substring_dedup(_mk(spark, [(1, a), (2, b)]), window=4))
    assert out[1] == ("x1 x2", 11, 2)
    assert out[2] == ("", 9, 0)  # doc 2 was entirely duplicated


def test_doc_shorter_than_window_untouched(spark):
    out = _out(
        exact_substring_dedup(
            _mk(spark, [(1, "a b c"), (2, "a b c")]), window=8
        )
    )
    # both docs are identical but shorter than the window: no 8-gram
    # exists, so nothing is removed (whole-doc dedup is exact_dedup's job)
    assert out[1] == ("a b c", 3, 3)
    assert out[2] == ("a b c", 3, 3)


def test_within_doc_repeat_modes(spark):
    # one doc repeats its own 8-gram; no other doc shares it.
    run = " ".join(WORDS[:8])
    text = run + " mid " + run
    df = _mk(spark, [(1, text), (2, "unrelated words only here")])
    docs_mode = _out(exact_substring_dedup(df, window=8, count_mode="docs"))
    occ_mode = _out(
        exact_substring_dedup(df, window=8, count_mode="occurrences")
    )
    # docs mode: the gram occurs in 1 distinct doc -> kept
    assert docs_mode[1] == (text, 17, 17)
    # occurrences mode (Lee et al.): 2 total occurrences -> both removed
    assert occ_mode[1] == ("mid", 17, 1)
    assert occ_mode[2][2] == 4  # untouched bystander


def test_survivors_are_an_ordered_subsequence(spark):
    shared = " ".join(WORDS[10:20])
    rows = [
        (i, f"p{i} q{i} " + shared + f" r{i} s{i} t{i}") for i in range(6)
    ]
    out = exact_substring_dedup(_mk(spark, rows), window=8)
    for r in out.collect():
        orig = r["text"].split(" ")
        keptw = r["clean_text"].split(" ") if r["clean_text"] else []
        # subsequence check
        it = iter(orig)
        assert all(w in it for w in keptw)
        assert r["n_kept"] == len(keptw)
        assert r["n_words"] == len(orig)


def test_count_law_and_schema(spark):
    shared = " ".join(WORDS[:12])
    df = exact_substring_dedup(
        _mk(spark, [(1, "a " + shared), (2, shared + " b")]), window=8
    )
    got = df.select(
        "doc_id",
        (F.col("n_kept") == F.size(F.filter(
            F.split("clean_text", " "), lambda s: s != ""
        ))).alias("law"),
    ).collect()
    assert all(r["law"] for r in got)
    assert df.schema["n_kept"].dataType.simpleString() == "bigint"
    assert df.schema["n_words"].dataType.simpleString() == "bigint"


def test_no_python_nodes_in_plan(spark):
    df = exact_substring_dedup(_mk(spark, [(1, "a b c d e f g h i")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Property: the DataFrame plan equals a brute-force Python reference on
# adversarial small corpora (tiny vocabulary forces heavy gram collisions,
# overlapping/nested duplicate runs, cross- and within-doc repeats).
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ref(docs, window, min_docs, mode):
    from collections import defaultdict

    toks = {d: t.split(" ") for d, t in docs.items()}
    occ = defaultdict(list)
    for d, w in toks.items():
        for i in range(len(w) - window + 1):
            occ[tuple(w[i : i + window])].append(d)
    if mode == "docs":
        dup = {g for g, ds in occ.items() if len(set(ds)) >= min_docs}
    else:
        dup = {g for g, ds in occ.items() if len(ds) >= min_docs}
    out = {}
    for d, w in toks.items():
        covered = set()
        for i in range(len(w) - window + 1):
            if tuple(w[i : i + window]) in dup:
                covered.update(range(i, i + window))
        kept = [w[i] for i in range(len(w)) if i not in covered]
        out[d] = (" ".join(kept), len(w), len(kept))
    return out


_corpus = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14),
    min_size=2,
    max_size=5,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus, window=st.integers(2, 4), mode=st.sampled_from(
    ["docs", "occurrences"]
))
def test_matches_bruteforce_reference(spark, corpus, window, mode):
    docs = {i: " ".join(words) for i, words in enumerate(corpus)}
    df = _mk(spark, list(docs.items()))
    got = _out(exact_substring_dedup(df, window=window, count_mode=mode))
    assert got == _ref(docs, window, 2, mode)


class TestExactSubstringDecontaminate:
    def test_embedded_eval_span_is_excised(self, spark):
        from commerce_sessionization_spark.operators.dedup import (
            exact_substring_decontaminate,
        )
        eval_span = "q one q two q three q four q five q six q seven q eight"
        train = spark.createDataFrame(
            [
                (1, f"lead in words here {eval_span} trailing body text"),
                (2, "completely clean document with its own words only here"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, f"benchmark prompt {eval_span} benchmark answer")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in exact_substring_decontaminate(
                train, bench, window=8
            ).collect()
        }
        # every word of the 16-token eval span is gone from doc 1
        for w in eval_span.split():
            assert w not in out[1].clean_text.split()
        assert "lead" in out[1].clean_text and "trailing" in out[1].clean_text
        # clean doc untouched
        assert out[2].clean_text == out[2].text
        assert out[2].n_kept == out[2].n_words

    def test_no_overlap_means_no_change(self, spark):
        from commerce_sessionization_spark.operators.dedup import (
            exact_substring_decontaminate,
        )
        train = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(30)))],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(9, " ".join(f"b{i}" for i in range(30)))],
            "doc_id long, text string",
        )
        [r] = exact_substring_decontaminate(train, bench).collect()
        assert r.clean_text == r.text and r.n_kept == 30

    def test_fully_leaked_train_doc_empties(self, spark):
        from commerce_sessionization_spark.operators.dedup import (
            exact_substring_decontaminate,
        )
        text = " ".join(f"w{i}" for i in range(12))
        train = spark.createDataFrame([(1, text)], "doc_id long, text string")
        bench = spark.createDataFrame(
            [(9, f"prefix {text} suffix")], "doc_id long, text string"
        )
        [r] = exact_substring_decontaminate(train, bench, window=8).collect()
        assert r.clean_text == "" and r.n_kept == 0 and r.n_words == 12

    def test_short_train_docs_below_window_survive(self, spark):
        from commerce_sessionization_spark.operators.dedup import (
            exact_substring_decontaminate,
        )
        train = spark.createDataFrame(
            [(1, "tiny doc")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(9, "tiny doc " + " ".join(f"x{i}" for i in range(10)))],
            "doc_id long, text string",
        )
        [r] = exact_substring_decontaminate(train, bench, window=8).collect()
        assert r.clean_text == "tiny doc"  # no 8-gram can cover it
