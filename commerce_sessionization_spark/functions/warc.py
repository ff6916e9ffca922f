"""WARC (ISO 28500) reading — the container CommonCrawl ships crawls in.

A web-scale training pipeline's first input is not HTML files, it is
WARC: framed records (``WARC/1.0`` header block + Content-Length body)
concatenated in a file, usually with each record its own gzip member so
readers can stream without decompressing the whole file. This module
parses exactly that framing dependency-free (stdlib ``zlib``): record
headers, the embedded HTTP response status/headers, and the payload —
no network stack, no HTML opinion (that's ``operators.text.strip_html``
downstream).

Spec: ISO 28500 / the WARC 1.0–1.1 format as published by IIPC
(framing: header line, ``Name: value`` headers, empty line, exactly
``Content-Length`` body bytes, then ``\\r\\n\\r\\n``). Reference parity
note: the reference repo (f-lab-edu/commerce-sessionization) has no
crawl surface; this belongs to the training-data north star.
"""

from __future__ import annotations

import zlib

from commerce_sessionization_spark.functions.codecs import UnsupportedMediaError

_CRLF = b"\r\n"


def _split_headers(block: bytes) -> dict[str, str]:
    """``Name: value`` lines → dict (first line excluded by callers)."""
    out: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().decode("latin1").lower()] = v.strip().decode(
                "latin1"
            )
    return out


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the per-record WARC norm)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out += d.decompress(data[pos:])
        out += d.flush()
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return bytes(out)


def parse_http_response(payload: bytes) -> tuple[int | None, dict, bytes]:
    """(status, headers, body) from an HTTP/1.x response byte block.

    Returns ``(None, {}, payload)`` when the payload is not an HTTP
    response (e.g. a ``resource`` record) — data, not an error.
    """
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return None, {}, payload
    head, body = payload[:sep], payload[sep + 4 :]
    status_line, _, header_block = head.partition(_CRLF)
    parts = status_line.split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, payload
    return status, _split_headers(header_block), body


def parse_warc(data: bytes, max_records: int | None = None) -> list[dict]:
    """Parse a WARC file's records (plain or per-record-gzipped).

    Each record yields ``{warc_type, target_uri, warc_date, record_id,
    content_type, content_length, http_status, http_content_type,
    payload}``. Framing damage (bad Content-Length, missing version
    line) stops the walk at the last good record rather than raising —
    a crawl reader must salvage the prefix of a truncated file.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    if not data.startswith(b"WARC/"):
        raise UnsupportedMediaError("not a WARC payload")
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            break
        sep = data.find(_CRLF + _CRLF, pos)
        if sep < 0:
            break
        header_block = data[pos:sep]
        _, _, header_rest = header_block.partition(_CRLF)
        headers = _split_headers(header_rest)
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = sep + 4
        if body_start + length > n:
            break  # truncated final record: salvage what we have
        payload = data[body_start : body_start + length]
        status, http_headers, http_body = parse_http_response(payload)
        records.append(
            {
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "record_id": headers.get("warc-record-id"),
                "content_type": headers.get("content-type"),
                "content_length": length,
                "http_status": status,
                "http_content_type": http_headers.get("content-type"),
                "payload": http_body if status is not None else payload,
            }
        )
        pos = body_start + length
        while data.startswith(_CRLF, pos):  # inter-record CRLFs
            pos += 2
        if max_records is not None and len(records) >= max_records:
            break
    return records


# ---------------------------------------------------------------------------
# Fixture writers (no WARC library ships in this environment)


def build_warc_record(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000001>",
    date: str = "2024-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """One spec-literal WARC/1.0 record."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"WARC-Date: " + date.encode(),
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if target_uri:
        headers.insert(2, b"WARC-Target-URI: " + target_uri.encode())
    return _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def build_http_response(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """An HTTP/1.1 response block for a WARC ``response`` record."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
        status, "OK"
    )
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def build_warc(records: list[bytes], gzip_per_record: bool = False) -> bytes:
    """Concatenate records into a WARC file, optionally one gzip member
    per record (the CommonCrawl layout)."""
    if not gzip_per_record:
        return b"".join(records)
    out = bytearray()
    for r in records:
        c = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        out += c.compress(r)
        out += c.flush()
    return bytes(out)
