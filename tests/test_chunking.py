"""Chunking + sequence-packing invariants.

The layout contract (window W, stride S): chunk i covers tokens
[i*S, min(i*S+W, n)); 1 + ceil(max(0, n-W)/S) chunks; consecutive chunks
overlap by W-S tokens; every token is covered. Packing: per-bin token
sums never exceed the budget except for documented oversize singleton
bins; offsets are contiguous; output is deterministic.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_layout_contract(spark):
    # 85 distinct tokens, W=32, S=24 -> chunks at 0/24/48/72, last short
    toks = [f"t{i}" for i in range(85)]
    df = _docs(spark, [" ".join(toks)])
    rows = sorted(
        chunk_documents(df, window=32, stride=24).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.token_start for r in rows] == [0, 24, 48, 72]
    assert [r.chunk_tokens for r in rows] == [32, 32, 32, 13]
    # coverage: union of chunk tokens == the document
    seen = []
    for r in rows:
        seen.extend(r.chunk_text.split(" "))
    assert set(seen) == set(toks)
    # overlap: last W-S tokens of chunk i == first W-S of chunk i+1
    for a, b in zip(rows, rows[1:]):
        at, bt = a.chunk_text.split(" "), b.chunk_text.split(" ")
        assert at[24:] == bt[: len(at[24:])]


def test_chunk_short_doc_single_chunk(spark):
    df = _docs(spark, ["only four small tokens", ""])
    rows = {r.doc_id: r for r in chunk_documents(df, window=32, stride=24).collect()}
    assert rows[0].chunk_text == "only four small tokens"
    assert rows[0].chunk_tokens == 4
    # empty string still yields exactly one (empty-ish) chunk
    assert rows[1].chunk_id == 0


def test_chunk_boundary_exact_multiple(spark):
    # n == W -> exactly one chunk; n == W + S -> two full-stride chunks
    df = _docs(spark, [" ".join(["x"] * 32), " ".join(["y"] * 56)])
    counts = (
        chunk_documents(df, window=32, stride=24)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    got = {r.doc_id: r["count"] for r in counts}
    assert got == {0: 1, 1: 2}


def test_chunker_is_shuffle_free(spark, tmp_path):
    # a narrow plan: zero Exchange nodes from parquet scan to output
    df = _docs(spark, [" ".join(["w"] * 100)] * 4)
    p = str(tmp_path / "docs")
    df.write.parquet(p)
    out = chunk_documents(spark.read.parquet(p))
    formatted = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert len(re.findall(r"\(\d+\) Exchange", formatted)) == 0, formatted


def test_pack_respects_budget(spark):
    df = spark.createDataFrame(
        [(i, 1 + (i * 37) % 90) for i in range(300)],
        "doc_id long, n_tokens long",
    )
    out = pack_sequences(df, budget=128, n_buckets=4).collect()
    bins: dict[tuple, list] = {}
    for r in out:
        bins.setdefault((r.bucket, r.bin_idx), []).append(r)
    for members in bins.values():
        members.sort(key=lambda r: r.bin_offset)
        total = sum(r.item_tokens for r in members)
        if len(members) == 1:
            continue  # oversize singleton bins may exceed the budget
        assert total <= 128
        # offsets are contiguous prefix sums
        off = 0
        for r in members:
            assert r.bin_offset == off
            off += r.item_tokens


def test_pack_oversize_items_get_own_bin(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 999), (2, 10)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, budget=100, n_buckets=1).collect()
    by_id = {r.doc_id: r for r in out}
    big = by_id[1]
    # the oversize item shares its bin with nobody
    assert sum(1 for r in out if r.bin_idx == big.bin_idx) == 1
    assert big.bin_offset == 0


def test_pack_deterministic(spark):
    df = spark.createDataFrame(
        [(i, 1 + i % 50) for i in range(200)], "doc_id long, n_tokens long"
    )
    a = sorted(map(tuple, pack_sequences(df, budget=64).collect()))
    b = sorted(map(tuple, pack_sequences(df, budget=64).collect()))
    assert a == b


def test_pack_total_conservation(spark):
    # every input row appears exactly once with its full length
    df = spark.createDataFrame(
        [(i, 5 + i % 20) for i in range(150)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, budget=64, n_buckets=3)
    assert out.count() == 150
    assert (
        out.agg(F.sum("item_tokens")).collect()[0][0]
        == df.agg(F.sum("n_tokens")).collect()[0][0]
    )


def test_chunker_runs_on_a_stream(spark, tmp_path):
    """chunk_documents is stateless+narrow, so the same call works on a
    readStream frame — batch/stream unification like pii_scrub."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    df = _docs(spark, [" ".join([f"t{i}" for i in range(40)])])
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        chunk_documents(stream, window=32, stride=24)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.read.parquet(out).select(
            "doc_id", "chunk_id", "token_start", "chunk_tokens").collect())
    )
    want = sorted(
        map(tuple, chunk_documents(df, window=32, stride=24).select(
            "doc_id", "chunk_id", "token_start", "chunk_tokens").collect())
    )
    assert got == want


def test_chunk_then_pack_never_overflows(spark):
    """Composition contract: chunks are <= W tokens, W < budget, so no
    oversize singleton bins exist and EVERY bin respects the budget."""
    texts = [" ".join([f"w{i}_{j}" for j in range(5 + (i * 13) % 120)])
             for i in range(60)]
    df = _docs(spark, texts)
    chunks = chunk_documents(df, window=32, stride=24)
    items = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_tokens").alias("n_tokens"),
    )
    packed = pack_sequences(items, budget=128, n_buckets=4).collect()
    fills: dict[tuple, int] = {}
    for r in packed:
        fills[(r.bucket, r.bin_idx)] = fills.get((r.bucket, r.bin_idx), 0) + r.item_tokens
    assert fills and all(v <= 128 for v in fills.values())


# ---------------------------------------------------------------------------
# Sentence-preserving chunking


def test_sentence_chunks_never_split_sentences(spark):
    from commerce_sessionization_spark.operators.chunking import (
        chunk_by_sentences,
    )

    text = (
        "First sentence here. Second one follows! Third is a question? "
        * 4
        + "Trailing unterminated bit"
    )
    df = spark.createDataFrame(
        [(1, text), (2, "Tiny."), (3, "")], ["doc_id", "text"]
    )
    out = chunk_by_sentences(df, max_chars=80).orderBy(
        "doc_id", "chunk_id"
    ).collect()
    one = [r for r in out if r["doc_id"] == 1]
    # every chunk ends on a sentence boundary or is the trailing bit
    for r in one:
        assert r["chunk_text"][-1] in ".!?" or "Trailing" in r["chunk_text"]
    # overshoot bounded by one sentence length
    assert all(r["chunk_chars"] < 80 + 65 for r in one)
    # chunk ids contiguous from 0 and the full text is covered in order
    assert [r["chunk_id"] for r in one] == list(range(len(one)))
    reassembled = " ".join(r["chunk_text"] for r in one)
    assert reassembled.split() == text.split()
    assert [r for r in out if r["doc_id"] == 3] == []  # empty doc: no rows
    assert [r for r in out if r["doc_id"] == 2][0]["chunk_text"] == "Tiny."


def test_sentence_chunks_single_long_sentence_is_one_chunk(spark):
    from commerce_sessionization_spark.operators.chunking import (
        chunk_by_sentences,
    )

    df = spark.createDataFrame(
        [(1, "word " * 100 + "end.")], ["doc_id", "text"]
    )
    out = chunk_by_sentences(df, max_chars=50).collect()
    assert len(out) == 1  # a sentence is never split, however long
    assert out[0]["n_sentences"] == 1


class TestPackSequencesFFD:
    def _docs(self, spark, lens):
        return spark.createDataFrame(
            [(i, ln) for i, ln in enumerate(lens)],
            "doc_id long, n_tokens long",
        )

    def _pack(self, spark, lens, budget=10, n_buckets=1):
        from commerce_sessionization_spark.operators.chunking import (
            pack_sequences_ffd,
        )
        return pack_sequences_ffd(
            self._docs(spark, lens), budget=budget, n_buckets=n_buckets
        ).collect()

    def test_hand_computable_ffd_layout(self, spark):
        """lens 7,6,4,3,2 budget 10 ⇒ FFD sorted desc: 7→bin0, 6→bin1,
        4→bin1 (6+4=10), 3→bin0 (7+3=10), 2→bin2. Next-fit in id order
        would need 3 bins with waste 8; FFD wastes 8 too here but the
        layout is the textbook one."""
        rows = {r.doc_id: (r.bin_idx, r.bin_offset)
                for r in self._pack(spark, [7, 6, 4, 3, 2])}
        assert rows[0] == (0, 0)   # len 7, first
        assert rows[1] == (1, 0)   # len 6
        assert rows[2] == (1, 6)   # len 4 fits bin1 exactly
        assert rows[3] == (0, 7)   # len 3 fits bin0 exactly
        assert rows[4] == (2, 0)   # len 2 opens bin2

    def test_laws_on_testdata(self, spark):
        """Every doc exactly once; per-bin sums ≤ budget except oversize
        singletons; offsets are placement-order prefix sums; waste ≤
        the next-fit packing of the same rows."""
        from collections import defaultdict

        from pyspark.sql import functions as F

        from commerce_sessionization_spark.operators.chunking import (
            pack_sequences,
            pack_sequences_ffd,
        )
        from commerce_sessionization_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
        budget = 512
        ffd = pack_sequences_ffd(docs, budget=budget, n_buckets=8).collect()
        nf = pack_sequences(docs, budget=budget, n_buckets=8).collect()
        assert sorted(r.doc_id for r in ffd) == sorted(r.doc_id for r in nf)
        sums = defaultdict(int)
        for r in ffd:
            sums[(r.bucket, r.bin_idx)] += r.item_tokens
        for (b, bi), s in sums.items():
            singles = [
                r for r in ffd if (r.bucket, r.bin_idx) == (b, bi)
            ]
            assert s <= budget or (
                len(singles) == 1 and singles[0].item_tokens > budget
            )
        # offsets: within each bin, sorting by offset gives contiguous
        # prefix sums of the items in placement order
        by_bin = defaultdict(list)
        for r in ffd:
            by_bin[(r.bucket, r.bin_idx)].append(r)
        for rows in by_bin.values():
            rows.sort(key=lambda r: r.bin_offset)
            run = 0
            for r in rows:
                assert r.bin_offset == run
                run += r.item_tokens

        def waste(rows):
            fill = defaultdict(int)
            for r in rows:
                fill[(r.bucket, r.bin_idx)] += r.item_tokens
            return sum(max(budget - s, 0) for s in fill.values())

        assert waste(ffd) <= waste(nf)

    def test_repartition_invariance(self, spark):
        from commerce_sessionization_spark.operators.chunking import (
            pack_sequences_ffd,
        )
        df = self._docs(spark, [5, 9, 2, 8, 3, 7, 1, 6] * 5)
        a = sorted(
            (r.doc_id, r.bucket, r.bin_idx, r.bin_offset)
            for r in pack_sequences_ffd(df, budget=10, n_buckets=4).collect()
        )
        b = sorted(
            (r.doc_id, r.bucket, r.bin_idx, r.bin_offset)
            for r in pack_sequences_ffd(
                df.repartition(7), budget=10, n_buckets=4
            ).collect()
        )
        assert a == b

    def test_segment_tree_matches_naive_linear_scan(self, spark):
        """The O(log B) max-segment-tree first fit (ADVICE r9) must
        place every item exactly where the naive O(bins) scan does —
        seeded random lengths incl. zeros and oversize, one bucket so
        the whole instance exercises one sequential walk."""
        import random

        rng = random.Random(10)
        lens = [rng.randint(0, 14) for _ in range(400)] + [25, 0, 25]
        budget = 10
        rows = {
            r.doc_id: (r.bin_idx, r.bin_offset)
            for r in self._pack(spark, lens, budget=budget)
        }
        # naive linear-scan FFD over the same (len desc, id asc) order
        order = sorted(range(len(lens)), key=lambda i: (-lens[i], i))
        fills: list[int] = []
        expect = {}
        for i in order:
            ln = lens[i]
            placed = None
            for bi, fill in enumerate(fills):
                if fill + ln <= budget:
                    placed = bi
                    break
            if placed is None:
                placed = len(fills)
                fills.append(0)
            expect[i] = (placed, fills[placed])
            fills[placed] += ln
        assert rows == expect

    def test_oversize_gets_own_bin(self, spark):
        rows = self._pack(spark, [25, 3, 3], budget=10)
        big = [r for r in rows if r.item_tokens == 25][0]
        mates = [
            r for r in rows
            if (r.bucket, r.bin_idx) == (big.bucket, big.bin_idx)
            and r.doc_id != big.doc_id
        ]
        assert big.bin_offset == 0 and not mates
