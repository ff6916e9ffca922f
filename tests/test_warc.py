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
