"""BPE trainer invariants on hand-computable corpora."""

from __future__ import annotations

from commerce_sessionization_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    to_symbol_seqs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_first_merge_is_most_frequent_pair(spark):
    # "ab" appears in every word; (a,b) dominates
    df = _docs(spark, ["abx aby abz abx"])
    merges = bpe_train(df, n_merges=1)
    assert merges == [("a", "b", 4)]


def test_merge_sequence_on_classic_corpus(spark):
    # lo low low lowest: (l,o) x4 -> (lo,w) x3 -> ...
    df = _docs(spark, ["lo low low lowest"])
    merges = bpe_train(df, n_merges=2)
    assert merges[0] == ("l", "o", 4)
    assert merges[1] == ("lo", "w", 3)


def test_greedy_left_on_runs(spark):
    # "aaaa": pair (a,a) counts 3; after merge greedy-left -> [aa, aa]
    df = _docs(spark, ["aaaa"])
    merges = bpe_train(df, n_merges=1)
    assert merges == [("a", "a", 3)]
    seg = bpe_segment(df, merges).collect()[0]
    assert list(seg.tokens) == ["aa", "aa"]


def test_segment_preserves_text(spark):
    texts = ["the fast key order", "sort table scan merge the the"]
    df = _docs(spark, texts)
    merges = bpe_train(df, n_merges=5)
    out = {r.doc_id: list(r.tokens) for r in bpe_segment(df, merges).collect()}
    for i, t in enumerate(texts):
        # concatenating tokens reproduces the text (modulo spaces)
        assert "".join(out[i]) == t.replace(" ", "")


def test_train_stops_when_no_pair_repeats(spark):
    df = _docs(spark, ["ab cd ef"])
    merges = bpe_train(df, n_merges=10)
    assert merges == []  # every pair occurs once -> below min count


def test_determinism(spark):
    df = _docs(spark, ["scan scan sort sort key key value"])
    a = bpe_train(df, n_merges=4)
    b = bpe_train(df, n_merges=4)
    assert a == b


def test_symbolization_splits_chars(spark):
    rows = to_symbol_seqs(_docs(spark, ["ab c"])).collect()
    got = sorted(tuple(r.syms) for r in rows)
    assert got == [("a", "b"), ("c",)]
