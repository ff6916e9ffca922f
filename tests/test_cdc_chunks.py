"""Content-defined chunking: reassembly identity, the shift-resistance
law fixed segmentation lacks, and offset-independent boilerplate capture."""

from __future__ import annotations

import random

from commerce_sessionization_spark.operators.dedup import (
    cdc_chunk_dedup,
    cdc_chunks,
)
from commerce_sessionization_spark.plans.queries import q_cdc_chunk_docs

SF_DIR = "/root/testdata/sf0.01"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _chunk_map(spark, texts, divisor=8):
    rows = cdc_chunks(_docs(spark, texts), divisor=divisor).collect()
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    return {k: [t for _, t in sorted(v)] for k, v in out.items()}


def _words(rng, n, vocab=200):
    return [f"w{rng.randrange(vocab)}" for _ in range(n)]


def test_chunks_reassemble_to_original_text(spark):
    rng = random.Random(7)
    texts = [" ".join(_words(rng, rng.randint(1, 120))) for _ in range(20)]
    texts.append("")  # empty doc = one empty chunk
    for doc_id, chunks in _chunk_map(spark, texts).items():
        assert " ".join(chunks) == texts[doc_id]


def test_expected_chunk_length_tracks_divisor(spark):
    rng = random.Random(11)
    text = " ".join(_words(rng, 4000, vocab=10_000))
    chunks = _chunk_map(spark, [text], divisor=8)[0]
    avg = 4000 / len(chunks)
    # anchors fire at rate 1/8 ⇒ mean chunk length ≈ 8 (loose 2x bounds)
    assert 4 < avg < 16, avg


def test_insertion_perturbs_only_one_chunk(spark):
    rng = random.Random(23)
    base_words = _words(rng, 400, vocab=10_000)
    edited = base_words[:17] + ["INSERTED"] + base_words[17:]
    m = _chunk_map(spark, [" ".join(base_words), " ".join(edited)])
    base, after = set(m[0]), set(m[1])
    # shift-resistance: the edit can split/extend only the chunk the
    # insertion lands in — every other fingerprint survives verbatim
    assert len(base - after) <= 1, sorted(base - after)
    assert len(after - base) <= 2, sorted(after - base)
    # a fixed 4-token segmentation would lose every window after token
    # 17: ~95 of ~100 segments. Pin the contrast coarsely:
    lost_ratio = len(base - after) / len(base)
    assert lost_ratio < 0.05


def test_shared_run_detected_at_different_offsets(spark):
    rng = random.Random(31)
    boiler = " ".join(_words(rng, 60, vocab=10_000))
    a = " ".join(_words(rng, 5, vocab=50)) + " " + boiler
    b = " ".join(_words(rng, 23, vocab=50)) + " " + boiler
    out = {
        r.doc_id: r
        for r in cdc_chunk_dedup(_docs(spark, [a, b])).collect()
    }
    # the shared 60-token run chunks identically from its first anchor
    # on, despite 5- vs 23-token prefixes ⇒ both docs lose chunks
    assert out[0].n_kept < out[0].n_chunks
    assert out[1].n_kept < out[1].n_chunks
    assert boiler[-40:] not in out[0].clean_text
    assert boiler[-40:] not in out[1].clean_text


def test_unique_docs_pass_through_unchanged(spark):
    rng = random.Random(41)
    texts = [" ".join(_words(rng, 50, vocab=100_000)) for _ in range(5)]
    out = cdc_chunk_dedup(_docs(spark, texts)).collect()
    for r in out:
        assert r.clean_text == texts[r.doc_id]
        assert r.n_kept == r.n_chunks


def test_catalog_query_shape(spark):
    rows = q_cdc_chunk_docs(spark, SF_DIR).limit(50).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_kept <= r.n_chunks
