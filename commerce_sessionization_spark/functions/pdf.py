"""PDF text extraction — dependency-free (PDF 1.x, ISO 32000 subset).

Document corpora are the third leg of a training pipeline next to web
crawl and media, and their dominant container is PDF. This module
extracts what a corpus pass needs without a PDF library:

- object scan: every ``N G obj … endobj`` located by a byte scan, NOT
  the xref table — real-world PDFs ship broken/incremental xrefs, and a
  salvaging extractor wants every object it can find (the same
  damage-tolerance stance as the WARC reader),
- streams: ``/FlateDecode`` inflated via stdlib zlib (the overwhelming
  majority); other filters skip that stream, not the file,
- text: content-stream tokenizer for the text-showing operators ``Tj``
  ``'`` ``"`` and ``TJ`` (arrays with kerning numbers), literal-string
  escapes (``\\n``, ``\\(``, octal, line continuations) and hex strings,
  with ``Td/TD/T*`` treated as line breaks,
- metadata: the Info dictionary (Title/Author/Producer/CreationDate).

Out of scope, documented: CID/Type0 multibyte text (hex strings decode
byte-wise — CJK embedded fonts come out wrong, flagged via
``has_cid_fonts``), encrypted PDFs (raise), and layout reconstruction
(reading order is content-stream order, the standard fast-path
assumption).

Public spec: ISO 32000-1 / the Adobe PDF 1.7 reference. Reference
parity note: the reference repo has no document surface; north star.
"""

from __future__ import annotations

import re
import zlib

from commerce_sessionization_spark.functions.codecs import UnsupportedMediaError

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


def _find_objects(buf: bytes) -> dict[int, bytes]:
    """{object number: body bytes} by scanning for obj/endobj frames."""
    out: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(buf):
        end = buf.find(b"endobj", m.end())
        if end < 0:
            continue
        out[int(m.group(1))] = buf[m.end() : end]
    return out


def _stream_data(body: bytes) -> bytes | None:
    """The (decoded) stream payload of an object body, or None."""
    m = _STREAM_RE.search(body)
    if not m:
        return None
    data = body[m.end() :]
    tail = data.rfind(b"endstream")
    if tail >= 0:
        data = data[:tail].rstrip(b"\r\n")
    if b"/FlateDecode" in body[: m.start()]:
        try:
            return zlib.decompress(data)
        except zlib.error:
            return None  # damaged stream: skip it, not the file
    if b"/Filter" in body[: m.start()]:
        return None  # unsupported filter (DCT/LZW/ASCII85...)
    return data


def _refs(body: bytes, key: bytes) -> list[int]:
    """Object numbers referenced as ``/Key N 0 R`` or ``/Key [N 0 R ...]``."""
    m = re.search(key + rb"\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", body)
    if not m:
        return []
    return [int(n) for n in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]


def _pdf_string(raw: bytes) -> str:
    """Decode a PDF literal string's escapes (PDF 1.7 §7.3.4.2)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i]
        simple = {
            0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C,
            0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C,
        }
        if e in simple:
            out.append(simple[e])
            i += 1
        elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
            j = i
            while j < n and j - i < 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif e in (0x0A, 0x0D):  # line continuation: swallow the EOL
            i += 1
            if e == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:
            out.append(e)
            i += 1
    return out.decode("latin1")


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.|\([^)]*\))*\)"  # literal string (1 nesting level)
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|\[|\]"
    rb"|[A-Za-z'\"*]+"  # operators
    rb"|[-+.0-9]+",  # numbers
)


def _content_text(stream: bytes) -> str:
    """Visible text from one content stream, in stream order."""
    parts: list[str] = []
    pending_break = False

    def emit(s: str) -> None:
        nonlocal pending_break
        if pending_break and parts:
            parts.append("\n")
        pending_break = False
        parts.append(s)

    stack: list[str] = []
    in_array: list[str] | None = None
    for m in _TOKEN_RE.finditer(stream):
        tok = m.group(0)
        if tok.startswith(b"("):
            s = _pdf_string(tok[1:-1])
            if in_array is not None:
                in_array.append(s)
            else:
                stack.append(s)
        elif tok.startswith(b"<"):
            hx = re.sub(rb"\s", b"", tok[1:-1])
            if len(hx) % 2:
                hx += b"0"
            s = bytes.fromhex(hx.decode("ascii")).decode("latin1")
            if in_array is not None:
                in_array.append(s)
            else:
                stack.append(s)
        elif tok == b"[":
            in_array = []
        elif tok == b"]":
            stack.append("".join(in_array or []))
            in_array = None
        elif tok in (b"Tj", b"'", b'"', b"TJ"):
            if stack:
                if tok in (b"'", b'"'):
                    pending_break = True
                emit(stack[-1])
            stack.clear()
        elif tok in (b"Td", b"TD", b"T*"):
            pending_break = True
            stack.clear()
        elif tok in (b"BT", b"ET"):
            stack.clear()
    return "".join(parts)


def parse_pdf(payload: bytes) -> dict:
    """Structure + metadata: version, page count, Info fields, flags."""
    buf = bytes(payload or b"")
    if not buf.startswith(b"%PDF-"):
        raise UnsupportedMediaError("not a PDF payload")
    if b"/Encrypt" in buf:
        raise UnsupportedMediaError("pdf: encrypted documents unsupported")
    version = buf[5:8].decode("latin1", "replace")
    objs = _find_objects(buf)
    pages = [
        num for num, body in objs.items()
        if re.search(rb"/Type\s*/Page\b", body)
        and not re.search(rb"/Type\s*/Pages\b", body)
    ]
    info = {}
    for body in objs.values():
        if b"/Producer" in body or b"/Title" in body or b"/Author" in body:
            for key in (b"Title", b"Author", b"Producer", b"CreationDate"):
                m = re.search(
                    rb"/" + key + rb"\s*\((?:[^()\\]|\\.)*\)", body
                )
                if m:
                    raw = m.group(0).split(b"(", 1)[1][:-1]
                    info[key.decode().lower()] = _pdf_string(raw)
            if info:
                break
    return {
        "version": version,
        "n_pages": len(pages),
        "title": info.get("title"),
        "author": info.get("author"),
        "producer": info.get("producer"),
        "creation_date": info.get("creationdate"),
        "has_cid_fonts": b"/Type0" in buf or b"/CIDFont" in buf,
    }


def extract_pdf_text(payload: bytes) -> list[str]:
    """Per-page text, content-stream order. Pages whose streams are
    undecodable (unsupported filter, damage) yield ''."""
    buf = bytes(payload or b"")
    if not buf.startswith(b"%PDF-"):
        raise UnsupportedMediaError("not a PDF payload")
    if b"/Encrypt" in buf:
        raise UnsupportedMediaError("pdf: encrypted documents unsupported")
    objs = _find_objects(buf)
    page_nums = sorted(
        num for num, body in objs.items()
        if re.search(rb"/Type\s*/Page\b", body)
        and not re.search(rb"/Type\s*/Pages\b", body)
    )
    out = []
    for num in page_nums:
        text = []
        for ref in _refs(objs[num], rb"/Contents"):
            body = objs.get(ref)
            if body is None:
                continue
            data = _stream_data(body)
            if data:
                text.append(_content_text(data))
        out.append("".join(text))
    return out


# ---------------------------------------------------------------------------
# Fixture writer


def build_pdf(
    pages: list[str],
    title: str | None = None,
    producer: str = "fixture-writer",
    compress: bool = True,
) -> bytes:
    """Minimal valid PDF: pages tree, Helvetica, one content stream per
    page (``Td``-positioned lines), optional Flate compression, a real
    xref table (we scan objects, but other readers need it)."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ).encode("latin1", "replace")

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    n = len(pages)
    font = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    content_ids, page_ids = [], []
    pages_id_placeholder = None
    for text in pages:
        lines = text.split("\n")
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for i, ln in enumerate(lines):
            if i:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + esc(ln) + b") Tj")
        ops.append(b"ET")
        stream = b" ".join(ops)
        if compress:
            stream = zlib.compress(stream)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(stream)
        else:
            head = b"<< /Length %d >>" % len(stream)
        content_ids.append(
            add(head + b"\nstream\n" + stream + b"\nendstream")
        )
    pages_obj = add(b"PLACEHOLDER-PAGES")
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> "
                b"/Contents %d 0 R >>" % (pages_obj, font, cid)
            )
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    objs[pages_obj - 1] = (
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n)
    )
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_obj)
    info_body = b"<< /Producer (" + esc(producer) + b")"
    if title is not None:
        info_body += b" /Title (" + esc(title) + b")"
    info_body += b" >>"
    info = add(info_body)

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R /Info %d 0 R >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (len(objs) + 1, catalog, info, xref_at)
    )
    return bytes(out)
