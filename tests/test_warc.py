"""WARC ingestion: framing round-trips (plain + per-record gzip), damage
salvage, the Spark source, and the end-to-end crawl-to-corpus pipeline.
"""

from __future__ import annotations

import pytest

from commerce_sessionization_spark.functions.codecs import UnsupportedMediaError
from commerce_sessionization_spark.functions.warc import (
    build_http_response,
    build_warc,
    build_warc_record,
    parse_http_response,
    parse_warc,
)

HTML = (
    b"<html><head><title>T</title><style>p{}</style></head><body>"
    b"<h1>Hello &amp; welcome</h1><p>body text here</p>"
    b"<a href='/a'>one</a> <a href='/b'>two</a></body></html>"
)


def _demo_records():
    return [
        build_warc_record(
            "warcinfo",
            b"software: fixture\r\n",
            content_type="application/warc-fields",
        ),
        build_warc_record(
            "response",
            build_http_response(HTML),
            target_uri="HTTPS://Example.COM:443/Page/?utm_source=x&b=2&a=1",
        ),
        build_warc_record(
            "response",
            build_http_response(b"gone", 404),
            target_uri="https://example.com/missing",
        ),
        build_warc_record(
            "response",
            build_http_response(b'{"k": 1}', 200, "application/json"),
            target_uri="https://example.com/api",
        ),
    ]


@pytest.mark.parametrize("gz", [False, True], ids=["plain", "gzip-members"])
def test_warc_roundtrip(gz):
    recs = parse_warc(build_warc(_demo_records(), gzip_per_record=gz))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "response", "response",
    ]
    page = recs[1]
    assert page["http_status"] == 200
    assert page["http_content_type"] == "text/html; charset=utf-8"
    assert page["payload"] == HTML
    assert page["target_uri"].startswith("HTTPS://Example.COM")
    assert recs[2]["http_status"] == 404
    assert recs[0]["http_status"] is None  # warc-fields, not HTTP


def test_warc_truncated_file_salvages_prefix():
    data = build_warc(_demo_records())
    two = len(build_warc(_demo_records()[:2]))
    assert len(parse_warc(data[: two + 25])) == 2


def test_warc_rejects_non_warc():
    with pytest.raises(UnsupportedMediaError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\nnot a warc")


def test_http_response_parser_non_http_is_data():
    status, headers, body = parse_http_response(b"raw resource bytes")
    assert status is None and headers == {} and body == b"raw resource bytes"


@pytest.fixture(scope="module")
def warc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("warcs")
    (d / "seg-0.warc").write_bytes(build_warc(_demo_records()))
    (d / "seg-1.warc.gz").write_bytes(
        build_warc(
            [
                build_warc_record(
                    "response",
                    build_http_response(b"<p>second file</p>"),
                    target_uri="https://example.com/two",
                )
            ],
            gzip_per_record=True,
        )
    )
    (d / "junk.warc").write_bytes(b"not a warc at all")
    return str(d)


def test_read_warc_dir(spark, warc_dir):
    from commerce_sessionization_spark.sources.io import read_warc_dir

    rows = read_warc_dir(spark, warc_dir).collect()
    # 4 records from seg-0 + 1 from seg-1; junk.warc skipped, not fatal
    assert len(rows) == 5
    by_uri = {r["target_uri"]: r for r in rows if r["target_uri"]}
    assert bytes(by_uri["https://example.com/two"]["payload"]) == (
        b"<p>second file</p>"
    )
    assert by_uri["https://example.com/missing"]["http_status"] == 404


def test_crawl_to_corpus_end_to_end(spark, warc_dir):
    from commerce_sessionization_spark.operators.crawl import crawl_to_corpus
    from commerce_sessionization_spark.sources.io import read_warc_dir

    docs = crawl_to_corpus(read_warc_dir(spark, warc_dir)).collect()
    # only the two 200 text/html responses become documents
    assert len(docs) == 2
    by_url = {r["url"]: r for r in docs}
    # URL is canonicalized: case folded, default port + tracking params
    # dropped, params sorted, trailing slash removed
    assert "https://example.com/Page?a=1&b=2" in by_url
    page = by_url["https://example.com/Page?a=1&b=2"]
    # script/style gone, entities decoded, anchors are text
    assert page["text"] == "T Hello & welcome body text here one two"
    assert page["tag_count"] > 0 and 0 < page["link_density"] < 1
    assert page["n_chars"] == len(page["text"])


def test_crawl_to_corpus_link_density_gate(spark, warc_dir):
    from commerce_sessionization_spark.operators.crawl import crawl_to_corpus
    from commerce_sessionization_spark.sources.io import read_warc_dir

    docs = crawl_to_corpus(
        read_warc_dir(spark, warc_dir), max_link_density=0.05
    ).collect()
    assert {r["url"] for r in docs} == {"https://example.com/two"}


# ---------------------------------------------------------------------------
# Outlink extraction (web-graph builder)


def test_extract_links_resolution_rules(spark):
    from commerce_sessionization_spark.operators.crawl import extract_links

    html = (
        '<a href="https://other.com/abs">a</a> <a href="//cdn.com/x">b</a>'
        " <a href='/rooted/p'>c</a> <a href=\"rel/q\">d</a>"
        " <a href='#frag'>e</a> <a href=\"\">f</a> <A HREF=\"UP.html\">g</A>"
    )
    df = spark.createDataFrame(
        [("https://example.com/dir/page.html", html)], ["url", "html"]
    )
    rows = {r["href"]: r["dst"] for r in extract_links(df).collect()}
    assert rows["https://other.com/abs"] == "https://other.com/abs"
    assert rows["//cdn.com/x"] == "https://cdn.com/x"  # scheme inherited
    assert rows["/rooted/p"] == "https://example.com/rooted/p"
    assert rows["rel/q"] == "https://example.com/dir/rel/q"
    assert rows["UP.html"] == "https://example.com/dir/UP.html"  # case-blind
    assert "#frag" not in rows and "" not in rows  # dropped, not resolved


def test_extract_links_dedupes_repeated_hrefs(spark):
    from commerce_sessionization_spark.operators.crawl import extract_links

    df = spark.createDataFrame(
        [("https://a.com/p", '<a href="/x">1</a><a href="/x">2</a>')],
        ["url", "html"],
    )
    assert extract_links(df).count() == 1  # one edge per distinct href


def test_crawl_links_pagerank_composition(spark):
    """The full web-graph path: WARC bytes -> corpus -> edges -> PageRank.
    A 3-page cycle plus one page everyone links to; the hub must rank
    highest."""
    from commerce_sessionization_spark.functions.warc import (
        build_http_response,
        build_warc,
        build_warc_record,
    )
    from commerce_sessionization_spark.operators.crawl import extract_links
    from commerce_sessionization_spark.operators.graph import pagerank
    from pyspark.sql import functions as F

    def page(i):
        nxt = (i + 1) % 3
        body = (
            f'<html><body><a href="/p{nxt}">next</a>'
            f'<a href="/hub">hub</a></body></html>'
        ).encode()
        return build_warc_record(
            "response",
            build_http_response(body),
            target_uri=f"https://site.test/p{i}",
        )

    hub = build_warc_record(
        "response",
        build_http_response(b"<html><body>no links</body></html>"),
        target_uri="https://site.test/hub",
    )
    records = [page(i) for i in range(3)] + [hub]
    from commerce_sessionization_spark.functions.warc import parse_warc

    rows = [
        (r["target_uri"], r["payload"].decode())
        for r in parse_warc(build_warc(records))
    ]
    pages = spark.createDataFrame(rows, ["url", "html"])
    edges = extract_links(pages).select("src", "dst")
    vertices = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
    )
    ranks = pagerank(edges, vertices, iterations=10)
    top = ranks.orderBy(F.desc("rank")).first()
    assert top["node"] == "https://site.test/hub"


def test_crawl_to_corpus_boilerplate_mode(spark, warc_dir):
    from commerce_sessionization_spark.operators.crawl import crawl_to_corpus
    from commerce_sessionization_spark.sources.io import read_warc_dir

    plain = {
        r["url"]: r["text"]
        for r in crawl_to_corpus(read_warc_dir(spark, warc_dir)).collect()
    }
    boiler = {
        r["url"]: r["text"]
        for r in crawl_to_corpus(
            read_warc_dir(spark, warc_dir), min_text_chars=0, boilerplate=True
        ).collect()
    }
    url = "https://example.com/Page?a=1&b=2"
    # the fixture page's blocks are all short/link-heavy: boilerplate
    # mode strips everything, plain mode keeps the visible text
    assert plain[url] != ""
    assert boiler[url] == ""


def test_write_wet_roundtrip(spark, warc_dir, tmp_path):
    """Corpus -> WET files -> read back: the full crawl IO loop. WET is
    WARC with `conversion` records, so read_warc_dir parses our own
    output; text must survive byte-for-byte."""
    from commerce_sessionization_spark.operators.crawl import crawl_to_corpus
    from commerce_sessionization_spark.sources.io import (
        read_warc_dir,
        write_wet,
    )

    corpus = crawl_to_corpus(read_warc_dir(spark, warc_dir))
    out = str(tmp_path / "wet")
    manifest = write_wet(corpus, out).collect()
    assert sum(m["n_records"] for m in manifest) == corpus.count()

    back = read_warc_dir(spark, out).filter("warc_type = 'conversion'")
    got = {
        r["target_uri"]: bytes(r["payload"]).decode("utf-8")
        for r in back.collect()
    }
    want = {r["url"]: r["text"] for r in corpus.collect()}
    assert got == want
    # conversion records carry no HTTP block
    assert all(r["http_status"] is None for r in back.collect())


def test_write_wet_empty_partitions_yield_no_files(spark, tmp_path):
    from commerce_sessionization_spark.sources.io import write_wet

    df = spark.createDataFrame([], "url string, text string").repartition(4)
    out = str(tmp_path / "wet_empty")
    manifest = write_wet(df, out, date_col=None).collect()
    assert manifest == []


def test_crawl_feeds_dedup_family(spark, tmp_path):
    """Crawl output is documents-shaped, so the dedup family runs on it
    unchanged: two near-identical pages (one word differs) must pair in
    MinHash-LSH; the unrelated page must not."""
    from commerce_sessionization_spark.functions.warc import (
        build_http_response,
        build_warc,
        build_warc_record,
    )
    from commerce_sessionization_spark.operators.crawl import crawl_to_corpus
    from commerce_sessionization_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
    )
    from commerce_sessionization_spark.sources.io import read_warc_dir
    from pyspark.sql import functions as F

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away to the market where it buys a basket of fresh bread today"
    )
    texts = {
        "a": base,
        "b": base.replace("bread", "fruit"),  # near-dup of a
        "c": "completely different words live here with nothing shared "
        "at all between documents of this corpus whatsoever really",
    }
    recs = [
        build_warc_record(
            "response",
            build_http_response(f"<p>{t}</p>".encode()),
            target_uri=f"https://site.test/{k}",
        )
        for k, t in texts.items()
    ]
    d = tmp_path / "w"
    d.mkdir()
    (d / "s.warc").write_bytes(build_warc(recs))

    docs = crawl_to_corpus(read_warc_dir(spark, str(d))).select(
        F.col("doc_id"), F.col("text")
    )
    pairs = minhash_lsh_dedup_pairs(docs, threshold=0.5)
    ids = {
        r["url"].rsplit("/", 1)[-1]: r["doc_id"]
        for r in crawl_to_corpus(read_warc_dir(spark, str(d)))
        .select("url", "doc_id")
        .collect()
    }
    got = {
        tuple(sorted((r[0], r[1]))) for r in pairs.select("a", "b").collect()
    }
    assert tuple(sorted((ids["a"], ids["b"]))) in got
    assert all(ids["c"] not in p for p in got)


def test_crawl_to_corpus_survives_malformed_utf8(spark, tmp_path):
    """Real crawls contain pages whose declared charset lies: malformed
    UTF-8 must become U+FFFD text (for encoding_quality to score), not
    a MALFORMED_CHARACTER_CODING job failure."""
    from commerce_sessionization_spark.functions.warc import (
        build_http_response,
        build_warc,
        build_warc_record,
    )
    from commerce_sessionization_spark.operators.crawl import crawl_to_corpus
    from commerce_sessionization_spark.sources.io import read_warc_dir

    body = b"<p>ok \xff\xfe broken bytes</p>"
    rec = build_warc_record(
        "response",
        build_http_response(body),
        target_uri="https://site.test/bad",
    )
    d = tmp_path / "w"
    d.mkdir()
    (d / "s.warc").write_bytes(build_warc([rec]))
    docs = crawl_to_corpus(read_warc_dir(spark, str(d))).collect()
    assert len(docs) == 1
    assert "ok �� broken bytes" == docs[0]["text"]


def test_write_wet_record_ids_globally_unique(spark, tmp_path):
    """ISO 28500 §5.2: WARC-Record-ID must be globally unique. A
    per-partition counter alone collides across output files — the
    partition id is folded into the ID, so a multi-partition write must
    produce all-distinct IDs (warcinfo records included)."""
    from commerce_sessionization_spark.sources.io import (
        read_warc_dir,
        write_wet,
    )

    df = spark.createDataFrame(
        [(f"https://h{i % 4}.net/p{i}", f"text {i}") for i in range(40)],
        "url string, text string",
    ).repartition(4)
    out = str(tmp_path / "wet_ids")
    manifest = write_wet(df, out, date_col=None).collect()
    assert len(manifest) == 4  # multi-file write, or the test proves nothing
    back = read_warc_dir(spark, out)
    ids = [r["record_id"] for r in back.select("record_id").collect()]
    assert None not in ids
    assert len(ids) == len(set(ids)) == 40 + 4  # conversions + warcinfos
