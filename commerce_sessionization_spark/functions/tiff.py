"""Baseline TIFF pixel decode — dependency-free (TIFF 6.0 baseline).

Completes the TIFF story: ``functions.metadata.parse_tiff_exif`` already
triages dimensions/orientation/camera tags from the IFD; this module
decodes the pixels for the formats scanner/archival corpora actually
produce — 8-bit grayscale and RGB, strip-organized, with the three
baseline compressions:

- 1  (none),
- 5  (LZW — the TIFF variant: MSB-first bit packing and the
      "EarlyChange" code-width bump one entry BEFORE the table fills,
      both different from GIF's LZW),
- 32773 (PackBits run-length).

Predictor 2 (horizontal differencing, LZW's common companion) is
supported — undone with a per-row cumsum. Out of scope (raise
``UnsupportedMediaError`` loudly, same contract as the other codecs):
tiles, planar configuration 2, bit depths other than 8, JPEG-in-TIFF
(compression 6/7), CCITT fax codings, the floating-point predictor.
Encoders for all three compressions ship as spec-literal fixture
writers so round-trip tests need no external library.

Public spec: TIFF 6.0 (Adobe, 1992). Reference parity note: the
reference repo has no media surface; this is north-star territory.
"""

from __future__ import annotations

import struct

import numpy as np

from commerce_sessionization_spark.functions.codecs import UnsupportedMediaError

_TAG_WIDTH = 0x0100
_TAG_HEIGHT = 0x0101
_TAG_BITS = 0x0102
_TAG_COMPRESSION = 0x0103
_TAG_PHOTOMETRIC = 0x0106
_TAG_STRIP_OFFSETS = 0x0111
_TAG_SPP = 0x0115
_TAG_ROWS_PER_STRIP = 0x0116
_TAG_STRIP_COUNTS = 0x0117
_TAG_PLANAR = 0x011C
_TAG_PREDICTOR = 0x013D

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd_arrays(
    buf: bytes, off: int, endian: str
) -> tuple[dict[int, list[int]], int]:
    """IFD entries → ({tag: [values]}, next-IFD offset) for
    BYTE/SHORT/LONG of any count. Offset 0 = last page."""
    out: dict[int, list[int]] = {}
    (count,) = struct.unpack_from(endian + "H", buf, off)
    pos = off + 2
    for _ in range(count):
        tag, typ, n = struct.unpack_from(endian + "HHI", buf, pos)
        size = _TYPE_SIZE.get(typ, 0) * n
        at = pos + 8
        if size > 4:
            (at,) = struct.unpack_from(endian + "I", buf, pos + 8)
        if typ == 3:
            out[tag] = list(struct.unpack_from(endian + f"{n}H", buf, at))
        elif typ == 4:
            out[tag] = list(struct.unpack_from(endian + f"{n}I", buf, at))
        elif typ == 1:
            out[tag] = list(buf[at : at + n])
        pos += 12
    (nxt,) = struct.unpack_from(endian + "I", buf, pos)
    return out, nxt


def _ifd_chain(buf: bytes, first: int, endian: str) -> list[int]:
    """Offsets of every IFD (one per page), cycle-guarded."""
    offs, seen, off = [], set(), first
    while off and off not in seen and off + 2 <= len(buf):
        offs.append(off)
        seen.add(off)
        (count,) = struct.unpack_from(endian + "H", buf, off)
        nxt_at = off + 2 + count * 12
        if nxt_at + 4 > len(buf):
            break
        (off,) = struct.unpack_from(endian + "I", buf, nxt_at)
    return offs


def tiff_page_count(payload: bytes) -> int:
    """Number of pages (IFDs) in a TIFF — scanned docs are multi-page."""
    buf = bytes(payload or b"")
    if len(buf) < 8 or buf[:2] not in (b"II", b"MM"):
        raise UnsupportedMediaError("not a TIFF payload")
    endian = "<" if buf[:2] == b"II" else ">"
    magic, ifd0 = struct.unpack_from(endian + "HI", buf, 2)
    if magic != 42:
        raise UnsupportedMediaError("tiff: bad magic")
    return len(_ifd_chain(buf, ifd0, endian))


# ---------------------------------------------------------------------------
# TIFF-variant LZW (MSB-first, EarlyChange)


def tiff_lzw_decode(data: bytes) -> bytes:
    """LZW per TIFF 6.0 §13: 8-bit symbols, Clear=256, EOI=257, codes
    packed MSB-first, width bumps at table size 2^n - 1 (EarlyChange)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # 256 clear
        table.append(b"")  # 257 eoi
        return 9

    width = reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                width = reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise UnsupportedMediaError(
                        "tiff lzw: first code out of range"
                    )
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise UnsupportedMediaError("tiff lzw: code out of range")
            out += entry
            prev = entry
            # EarlyChange, decoder side: the table here lags the
            # encoder's next_code by one, so the width bump lands at
            # 2^w - 2 entries (TIFF 6.0 §13 pseudocode's 510/1022/2046)
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def tiff_lzw_encode(data: bytes) -> bytes:
    """Fixture-grade TIFF LZW encoder (single Clear, EOI at end)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(CLEAR, width)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        put(table[w], width)
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: restart
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = c
    if w:
        put(table[w], width)
    put(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)


def packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                break  # truncated replicate packet: salvage the prefix
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Fixture-grade PackBits: runs of >=3 become replicate packets."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


# ---------------------------------------------------------------------------
# decode / encode


def decode_tiff(payload: bytes, page: int = 0) -> tuple[np.ndarray, int]:
    """Decode a baseline TIFF page → (HxWx3 uint8 RGB, source channels).

    ``page`` walks the IFD chain (multi-page scans); IndexError past the
    last page, so callers can iterate with ``tiff_page_count``.
    """
    buf = bytes(payload or b"")
    if len(buf) < 8 or buf[:2] not in (b"II", b"MM"):
        raise UnsupportedMediaError("not a TIFF payload")
    endian = "<" if buf[:2] == b"II" else ">"
    magic, ifd0 = struct.unpack_from(endian + "HI", buf, 2)
    if magic != 42:
        raise UnsupportedMediaError("tiff: bad magic")
    chain = _ifd_chain(buf, ifd0, endian)
    if not chain:
        # fuzz-found: a valid header whose IFD pointer leads nowhere is
        # damaged media, not a caller error — must be the triage class
        raise UnsupportedMediaError("tiff: no readable IFDs")
    if page >= len(chain):
        raise IndexError(f"tiff: page {page} of {len(chain)}")
    tags, _ = _read_ifd_arrays(buf, chain[page], endian)

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise UnsupportedMediaError(f"tiff: missing tag {tag:#x}")
        return default

    width, height = one(_TAG_WIDTH), one(_TAG_HEIGHT)
    spp = one(_TAG_SPP, 1)
    bits = tags.get(_TAG_BITS, [8])
    if any(b != 8 for b in bits):
        raise UnsupportedMediaError("tiff: only 8-bit samples supported")
    if one(_TAG_PLANAR, 1) != 1:
        raise UnsupportedMediaError("tiff: planar configuration 2 unsupported")
    predictor = one(_TAG_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise UnsupportedMediaError(f"tiff: predictor {predictor} unsupported")
    comp = one(_TAG_COMPRESSION, 1)
    photometric = one(_TAG_PHOTOMETRIC, 1)
    if photometric not in (0, 1, 2):
        raise UnsupportedMediaError(
            f"tiff: photometric {photometric} unsupported (palette/YCbCr)"
        )
    rows_per_strip = one(_TAG_ROWS_PER_STRIP, height)
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise UnsupportedMediaError("tiff: bad strip tables")

    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        strip = buf[off : off + cnt]
        if comp == 1:
            raw += strip
        elif comp == 5:
            raw += tiff_lzw_decode(strip)
        elif comp == 32773:
            raw += packbits_decode(strip)
        else:
            raise UnsupportedMediaError(f"tiff: compression {comp} unsupported")
    need = width * height * spp
    if len(raw) < need:
        raise UnsupportedMediaError("tiff: truncated pixel data")
    arr = np.frombuffer(bytes(raw[:need]), dtype=np.uint8).reshape(
        height, width, spp
    )
    if predictor == 2:  # horizontal differencing: undo with a row cumsum
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    if photometric == 0:  # WhiteIsZero: invert
        arr = 255 - arr
    if spp == 1:
        rgb = np.repeat(arr, 3, axis=2)
        return np.ascontiguousarray(rgb), 1
    if spp >= 3:
        return np.ascontiguousarray(arr[:, :, :3]), 3
    raise UnsupportedMediaError(f"tiff: {spp} samples/pixel unsupported")


def encode_tiff_pages(imgs: list, **kwargs) -> bytes:
    """Multi-page fixture writer: one IFD per page, chained via the
    next-IFD pointer. Two passes — body sizes don't depend on their file
    position, so pass 1 measures and pass 2 writes with real origins."""
    assert imgs
    big_endian = kwargs.get("big_endian", False)
    endian = ">" if big_endian else "<"
    sizes = [len(_encode_page(im, 0, 0, **kwargs)) for im in imgs]
    origins = []
    pos = 8
    for sz in sizes:
        origins.append(pos)
        pos += sz
    out = bytearray((b"MM" if big_endian else b"II"))
    out += struct.pack(endian + "HI", 42, origins[0])
    for i, im in enumerate(imgs):
        nxt = origins[i + 1] if i + 1 < len(imgs) else 0
        out += _encode_page(im, origins[i], nxt, **kwargs)
    return bytes(out)


def encode_tiff(
    img: np.ndarray,
    compression: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    photometric: int | None = None,
    predictor: int = 1,
) -> bytes:
    """Spec-literal baseline TIFF writer for tests (gray or RGB, strips)."""
    endian = ">" if big_endian else "<"
    header = (b"MM" if big_endian else b"II") + struct.pack(endian + "HI", 42, 8)
    return header + _encode_page(
        img, 8, 0, compression, big_endian, rows_per_strip, photometric,
        predictor,
    )


def _encode_page(
    img: np.ndarray,
    origin: int,
    next_ifd: int,
    compression: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    photometric: int | None = None,
    predictor: int = 1,
) -> bytes:
    """One page body (IFD + pointed-to data + strips), laid out to sit
    at absolute file offset ``origin``."""
    endian = ">" if big_endian else "<"
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    rows_per_strip = rows_per_strip or h
    photometric = photometric if photometric is not None else (2 if spp == 3 else 1)
    if predictor == 2:  # horizontal differencing (mod 256 per sample)
        img = np.concatenate(
            [img[:, :1], (img[:, 1:].astype(np.int16) - img[:, :-1]) % 256],
            axis=1,
        ).astype(np.uint8)

    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = img[y0 : y0 + rows_per_strip].tobytes()
        if compression == 5:
            chunk = tiff_lzw_encode(chunk)
        elif compression == 32773:
            chunk = packbits_encode(chunk)
        elif compression != 1:
            raise ValueError("fixture writer: compression must be 1/5/32773")
        strips.append(chunk)

    n_strips = len(strips)

    def entry(tag: int, typ: int, n: int, value: int) -> bytes:
        head = struct.pack(endian + "HHI", tag, typ, n)
        if typ == 3 and n == 1:
            return head + struct.pack(endian + "H", value) + b"\x00\x00"
        return head + struct.pack(endian + "I", value)

    entries = []  # assembled after offsets are known
    n_entries = 9 + (1 if predictor == 2 else 0)
    after_ifd = origin + 2 + n_entries * 12 + 4
    extra = bytearray()
    extra_off = after_ifd

    def put_array(values: list[int], typ: int) -> int:
        nonlocal extra
        fmt = "H" if typ == 3 else "I"
        size = (2 if typ == 3 else 4) * len(values)
        if size <= 4:
            raise AssertionError("inline arrays handled by entry()")
        at = extra_off + len(extra)
        extra += struct.pack(endian + f"{len(values)}{fmt}", *values)
        return at

    # bits-per-sample array (only for RGB; gray fits inline)
    bits_ptr = None
    if spp == 3:
        bits_ptr = put_array([8, 8, 8], 3)

    strip_data_off = extra_off + len(extra) + (
        0 if n_strips == 1 else 2 * (4 * n_strips)
    )
    offsets = []
    pos = strip_data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    counts = [len(s) for s in strips]
    if n_strips == 1:
        off_value, cnt_value = offsets[0], counts[0]
    else:
        off_value = put_array(offsets, 4)
        cnt_value = put_array(counts, 4)

    entries.append(entry(_TAG_WIDTH, 4, 1, w))
    entries.append(entry(_TAG_HEIGHT, 4, 1, h))
    if spp == 3:
        entries.append(
            struct.pack(endian + "HHI", _TAG_BITS, 3, 3)
            + struct.pack(endian + "I", bits_ptr)
        )
    else:
        entries.append(entry(_TAG_BITS, 3, 1, 8))
    entries.append(entry(_TAG_COMPRESSION, 3, 1, compression))
    entries.append(entry(_TAG_PHOTOMETRIC, 3, 1, photometric))
    entries.append(entry(_TAG_STRIP_OFFSETS, 4, n_strips, off_value))
    entries.append(entry(_TAG_SPP, 3, 1, spp))
    entries.append(entry(_TAG_ROWS_PER_STRIP, 4, 1, rows_per_strip))
    entries.append(entry(_TAG_STRIP_COUNTS, 4, n_strips, cnt_value))
    if predictor == 2:
        entries.append(entry(_TAG_PREDICTOR, 3, 1, 2))
    entries.sort(key=lambda e: struct.unpack_from(endian + "H", e)[0])
    assert len(entries) == n_entries

    ifd = struct.pack(endian + "H", n_entries) + b"".join(entries)
    ifd += struct.pack(endian + "I", next_ifd)
    return ifd + bytes(extra) + b"".join(strips)


def tiff_features(asset_id: int, payload: bytes) -> dict:
    """IMAGE_FEATURES_SCHEMA row from a real TIFF decode."""
    from commerce_sessionization_spark.functions.codecs import (
        _luma,
        average_hash,
    )

    rgb, n_channels = decode_tiff(payload)
    return {
        "asset_id": asset_id,
        "width": rgb.shape[1],
        "height": rgb.shape[0],
        "n_channels": n_channels,
        "mean_luma": round(float(_luma(rgb).mean()), 6),
        "phash": average_hash(rgb),
    }
