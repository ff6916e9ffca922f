"""Embedded image metadata: EXIF (TIFF IFDs in JPEG APP1) + PNG chunks.

Vision-data pipelines filter and normalize on metadata long before they
look at pixels: EXIF orientation decides whether width/height are swapped
and whether a rotate is needed, DateTimeOriginal drives dedup/recency
heuristics, camera make/model powers source attribution, and a GPS IFD is
a PII flag the privacy scrub must catch. All of it lives in the first few
KB of the payload, so this parse is metadata-prefix-only — it never walks
entropy-coded image data.

Public specs only: EXIF is a TIFF byte stream (TIFF 6.0 IFD layout: II/MM
byte order, 12-byte tagged entries) carried in JPEG's APP1 segment with an
``Exif\\0\\0`` preamble; PNG ancillary chunks (tEXt/iTXt/pHYs/gAMA/tIME)
are defined by the PNG spec. Reference parity note: the reference repo
(f-lab-edu/commerce-sessionization) has no media surface; this belongs to
the training-data-pipeline north star alongside ``functions.containers``.
"""

from __future__ import annotations

import struct

from commerce_sessionization_spark.functions.codecs import UnsupportedMediaError

# TIFF/EXIF tag ids (TIFF 6.0 + EXIF 2.3)
_TAG_IMAGE_WIDTH = 0x0100
_TAG_IMAGE_HEIGHT = 0x0101
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_TAG_DT_ORIGINAL = 0x9003
_TAG_PIXEL_X = 0xA002
_TAG_PIXEL_Y = 0xA003


def _read_ifd(buf: bytes, base: int, offset: int, endian: str) -> dict[int, object]:
    """Read one TIFF IFD into {tag: value} (ASCII, SHORT, LONG only)."""
    out: dict[int, object] = {}
    if base + offset + 2 > len(buf):
        return out
    (count,) = struct.unpack_from(endian + "H", buf, base + offset)
    pos = base + offset + 2
    for _ in range(count):
        if pos + 12 > len(buf):
            break
        tag, typ, n = struct.unpack_from(endian + "HHI", buf, pos)
        value_field = pos + 8
        if typ == 2:  # ASCII
            size = n
            at = value_field if size <= 4 else base + struct.unpack_from(
                endian + "I", buf, value_field
            )[0]
            raw = buf[at : at + size]
            out[tag] = raw.split(b"\x00")[0].decode("latin1", "replace").strip()
        elif typ == 3:  # SHORT
            if n == 1:
                out[tag] = struct.unpack_from(endian + "H", buf, value_field)[0]
        elif typ == 4:  # LONG
            if n == 1:
                out[tag] = struct.unpack_from(endian + "I", buf, value_field)[0]
        pos += 12
    return out


def parse_tiff_exif(tiff: bytes) -> dict:
    """Parse a TIFF byte stream (as carried in EXIF) for the pipeline tags."""
    if len(tiff) < 8 or tiff[:2] not in (b"II", b"MM"):
        raise UnsupportedMediaError("exif: bad TIFF byte-order mark")
    endian = "<" if tiff[:2] == b"II" else ">"
    magic, ifd0_off = struct.unpack_from(endian + "HI", tiff, 2)
    if magic != 42:
        raise UnsupportedMediaError("exif: bad TIFF magic")
    ifd0 = _read_ifd(tiff, 0, ifd0_off, endian)
    meta = {
        "width": ifd0.get(_TAG_IMAGE_WIDTH),  # set for standalone TIFFs
        "height": ifd0.get(_TAG_IMAGE_HEIGHT),
        "orientation": ifd0.get(_TAG_ORIENTATION),
        "make": ifd0.get(_TAG_MAKE),
        "model": ifd0.get(_TAG_MODEL),
        "datetime": ifd0.get(_TAG_DATETIME),
        "datetime_original": None,
        "exif_width": None,
        "exif_height": None,
        "has_gps": _TAG_GPS_IFD in ifd0,
    }
    if _TAG_EXIF_IFD in ifd0:
        sub = _read_ifd(tiff, 0, int(ifd0[_TAG_EXIF_IFD]), endian)
        meta["datetime_original"] = sub.get(_TAG_DT_ORIGINAL)
        meta["exif_width"] = sub.get(_TAG_PIXEL_X)
        meta["exif_height"] = sub.get(_TAG_PIXEL_Y)
    return meta


def parse_jpeg_exif(payload: bytes) -> dict:
    """Find the APP1 Exif segment in a JPEG and parse its TIFF stream.

    Walks only marker headers (each segment is length-prefixed), stopping
    at start-of-scan — entropy-coded data is never touched. Returns the
    flat tag dict, or all-None/False fields when no Exif segment exists
    (plenty of real JPEGs carry none; that's data, not an error).
    """
    empty = {
        "width": None,
        "height": None,
        "orientation": None,
        "make": None,
        "model": None,
        "datetime": None,
        "datetime_original": None,
        "exif_width": None,
        "exif_height": None,
        "has_gps": False,
    }
    buf = bytes(payload or b"")
    if buf[:3] != b"\xff\xd8\xff":
        raise UnsupportedMediaError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            break
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them, or the walk misreads segment lengths.
        while pos + 2 <= len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(buf):
            break
        marker = buf[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", buf, pos + 2)
        if marker == 0xE1 and buf[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return {**empty, **parse_tiff_exif(buf[pos + 10 : pos + 2 + seg_len])}
        pos += 2 + seg_len
    return empty


def build_jpeg_with_exif(
    jpeg: bytes,
    orientation: int = 1,
    make: str = "TestCam",
    model: str = "T1000",
    datetime_original: str = "2019:10:01 10:30:00",
    gps: bool = False,
    big_endian: bool = False,
) -> bytes:
    """Splice a spec-literal EXIF APP1 segment into an existing JPEG.

    Fixture builder (no EXIF writer ships in this environment): assembles
    the TIFF stream by hand — IFD0 with orientation/make/model + pointers
    to an Exif sub-IFD (DateTimeOriginal) and optionally a GPS IFD — and
    inserts it right after SOI, where parsers expect APP1.
    """
    endian = ">" if big_endian else "<"

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        head = struct.pack(endian + "HHI", tag, typ, count)
        if typ == 3:  # SHORT is left-justified in the 4-byte value field
            return head + struct.pack(endian + "H", value) + b"\x00\x00"
        return head + struct.pack(endian + "I", value)

    def ascii_field(s: str) -> bytes:
        raw = s.encode() + b"\x00"
        # TIFF stores values <= 4 bytes inline in the entry itself; this
        # builder always uses the offset form, so pad to 5+ bytes
        return raw + b"\x00" * max(0, 5 - len(raw))

    make_b = ascii_field(make)
    model_b = ascii_field(model)
    dto_b = ascii_field(datetime_original)

    n0 = 5 + (1 if gps else 0)
    ifd0_off = 8
    after_ifd0 = ifd0_off + 2 + n0 * 12 + 4
    make_off = after_ifd0
    model_off = make_off + len(make_b)
    exif_ifd_off = model_off + len(model_b)
    after_exif = exif_ifd_off + 2 + 1 * 12 + 4
    dto_off = after_exif
    gps_ifd_off = dto_off + len(dto_b)

    ifd0 = struct.pack(endian + "H", n0)
    ifd0 += entry(_TAG_MAKE, 2, len(make_b), make_off)
    ifd0 += entry(_TAG_MODEL, 2, len(model_b), model_off)
    ifd0 += entry(_TAG_ORIENTATION, 3, 1, orientation)
    ifd0 += entry(_TAG_DATETIME, 2, len(dto_b), dto_off)
    ifd0 += entry(_TAG_EXIF_IFD, 4, 1, exif_ifd_off)
    if gps:
        ifd0 += entry(_TAG_GPS_IFD, 4, 1, gps_ifd_off)
    ifd0 += struct.pack(endian + "I", 0)  # next-IFD terminator

    exif_ifd = struct.pack(endian + "H", 1)
    exif_ifd += entry(_TAG_DT_ORIGINAL, 2, len(dto_b), dto_off)
    exif_ifd += struct.pack(endian + "I", 0)

    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(endian + "HI", 42, ifd0_off)
        + ifd0
        + make_b
        + model_b
        + exif_ifd
        + dto_b
    )
    if gps:
        # minimal GPS IFD: one version entry is enough to flag presence
        tiff += struct.pack(endian + "H", 1)
        tiff += entry(0x0000, 3, 1, 2)
        tiff += struct.pack(endian + "I", 0)

    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body
    if jpeg[:3] != b"\xff\xd8\xff":
        raise UnsupportedMediaError("fixture base is not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def build_tiff(
    width: int = 64,
    height: int = 48,
    orientation: int = 1,
    make: str = "TestCam",
    model: str = "T1000",
    big_endian: bool = False,
) -> bytes:
    """Assemble a minimal standalone TIFF header for triage tests.

    Fixture builder (no TIFF writer ships in this environment): IFD0 with
    ImageWidth/ImageLength (LONG), Orientation (SHORT), and Make/Model
    (ASCII, offset form) — the exact tags ``parse_tiff_exif`` reads when
    the payload is a bare ``II*\\0`` / ``MM\\0*`` file rather than an EXIF
    APP1 stream. No strip/pixel data: triage is metadata-prefix-only.
    """
    endian = ">" if big_endian else "<"

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        head = struct.pack(endian + "HHI", tag, typ, count)
        if typ == 3:
            return head + struct.pack(endian + "H", value) + b"\x00\x00"
        return head + struct.pack(endian + "I", value)

    def ascii_field(s: str) -> bytes:
        raw = s.encode() + b"\x00"
        return raw + b"\x00" * max(0, 5 - len(raw))

    make_b, model_b = ascii_field(make), ascii_field(model)
    n0 = 5
    ifd0_off = 8
    after_ifd0 = ifd0_off + 2 + n0 * 12 + 4
    make_off = after_ifd0
    model_off = make_off + len(make_b)

    ifd0 = struct.pack(endian + "H", n0)
    ifd0 += entry(_TAG_IMAGE_WIDTH, 4, 1, width)
    ifd0 += entry(_TAG_IMAGE_HEIGHT, 4, 1, height)
    ifd0 += entry(_TAG_MAKE, 2, len(make_b), make_off)
    ifd0 += entry(_TAG_MODEL, 2, len(model_b), model_off)
    ifd0 += entry(_TAG_ORIENTATION, 3, 1, orientation)
    ifd0 += struct.pack(endian + "I", 0)
    return (
        (b"MM" if big_endian else b"II")
        + struct.pack(endian + "HI", 42, ifd0_off)
        + ifd0
        + make_b
        + model_b
    )


def jpeg_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF marker — header walk only."""
    buf = bytes(payload or b"")
    if buf[:3] != b"\xff\xd8\xff":
        raise UnsupportedMediaError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            break
        while pos + 2 <= len(buf) and buf[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2 fill bytes before the marker code
        if pos + 4 > len(buf):
            break
        marker = buf[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack_from(">HH", buf, pos + 5)
            return w, h
        (seg_len,) = struct.unpack_from(">H", buf, pos + 2)
        pos += 2 + seg_len
    raise UnsupportedMediaError("jpeg: no SOF marker found")


# ---------------------------------------------------------------------------
# PNG ancillary chunks


def parse_png_metadata(payload: bytes) -> dict:
    """Read PNG header facts + ancillary chunks (tEXt/iTXt/pHYs/tIME).

    Returns bit depth / color type from IHDR, DPI from pHYs (when the unit
    is meters), last-modified from tIME, and all textual key→value pairs —
    where real-world PNGs carry software provenance and, increasingly,
    generative-model prompts; exactly the fields a corpus pipeline wants
    queryable without decoding pixels.
    """
    from commerce_sessionization_spark.functions.codecs import _png_chunks

    meta = {
        "width": None,
        "height": None,
        "bit_depth": None,
        "color_type": None,
        "dpi": None,
        "modified": None,
        "text": {},
    }
    for ctype, data in _png_chunks(bytes(payload or b"")):
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack_from(">IIBB", data)
            meta.update(width=w, height=h, bit_depth=depth, color_type=color)
        elif ctype == b"pHYs" and len(data) >= 9:
            ppx, _ppy, unit = struct.unpack_from(">IIB", data)
            if unit == 1:  # pixels per meter
                meta["dpi"] = round(ppx * 0.0254, 2)
        elif ctype == b"tIME" and len(data) >= 7:
            y, mo, d, hh, mm, ss = struct.unpack_from(">HBBBBB", data)
            meta["modified"] = f"{y:04d}-{mo:02d}-{d:02d} {hh:02d}:{mm:02d}:{ss:02d}"
        elif ctype == b"tEXt":
            key, _, val = data.partition(b"\x00")
            meta["text"][key.decode("latin1")] = val.decode("latin1")
        elif ctype == b"iTXt":
            key, _, rest = data.partition(b"\x00")
            if len(rest) >= 2 and rest[0] == 0:  # uncompressed only
                # skip compression-method byte + language + translated-kw
                parts = rest[2:].split(b"\x00", 2)
                if len(parts) == 3:
                    meta["text"][key.decode("latin1")] = parts[2].decode(
                        "utf-8", "replace"
                    )
        elif ctype == b"IEND":
            break
    if meta["width"] is None:
        raise UnsupportedMediaError("png: no IHDR chunk")
    return meta


def build_png_chunks(img_png: bytes, text: dict[str, str] | None = None,
                     dpi: float | None = None) -> bytes:
    """Insert tEXt/pHYs chunks after IHDR of an encoded PNG (fixtures)."""
    from commerce_sessionization_spark.functions.codecs import _png_chunk

    extra = b""
    if dpi is not None:
        ppm = int(round(dpi / 0.0254))
        extra += _png_chunk(b"pHYs", struct.pack(">IIB", ppm, ppm, 1))
    for k, v in (text or {}).items():
        extra += _png_chunk(b"tEXt", k.encode("latin1") + b"\x00" + v.encode("latin1"))
    # IHDR chunk is always the first 8(sig) + 25(IHDR) bytes
    return img_png[:33] + extra + img_png[33:]
