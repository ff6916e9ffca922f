"""Dependency-free media codecs for the multimodal operators.

The container ships no image/audio libraries, so the two formats with
trivially parseable containers are decoded by hand:

- **BMP** (Windows bitmap, ``BITMAPINFOHEADER``, uncompressed 24/32-bpp):
  enough for real width/height/channel extraction, mean luma, and an
  8×8 average-hash perceptual fingerprint.
- **PNG** (8-bit gray / RGB / palette / gray+alpha / RGBA, non-interlaced):
  DEFLATE is in the stdlib (``zlib``), so the full critical-chunk path —
  chunk walk, IDAT inflate, all five scanline filters (None/Sub/Up/
  Average/Paeth), palette expansion — is a real decode, not a stub.
- **WAV** (RIFF PCM, 16-bit): sample rate, duration, RMS amplitude.

Encoders for both formats are provided too — they generate test fixtures
and power round-trip property tests. Everything is numpy-vectorized; these
functions run inside Arrow-batched ``mapInPandas`` workers
(``operators.multimodal``), so per-element Python overhead is bounded by
the batch count, not the row count.

Formats that genuinely need codec libraries (JPEG/MP3/MP4) raise
``UnsupportedMediaError`` — the caller decides whether to skip or fail.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class UnsupportedMediaError(ValueError):
    """Payload is not in a format the dependency-free codecs handle."""


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, size, res1, res2, offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def decode_bmp(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an uncompressed 24/32-bpp BMP → (H×W×3 uint8 RGB, n_channels).

    Handles bottom-up (positive height) and top-down (negative height) pixel
    order and 4-byte row padding. Raises ``UnsupportedMediaError`` for
    anything that is not a plain ``BI_RGB`` BITMAPINFOHEADER bitmap.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP payload")
    _, _, _, _, pix_offset = _BMP_FILE_HEADER.unpack_from(payload, 0)
    (
        hdr_size,
        width,
        height,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _ncolors,
        _nimportant,
    ) = _BMP_INFO_HEADER.unpack_from(payload, 14)
    if hdr_size < 40 or compression != 0 or bpp not in (24, 32) or planes != 1:
        raise UnsupportedMediaError(
            f"unsupported BMP variant (hdr={hdr_size} bpp={bpp} comp={compression})"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise UnsupportedMediaError("degenerate BMP dimensions")
    n_channels = bpp // 8
    stride = (width * n_channels + 3) & ~3
    need = pix_offset + stride * height
    if len(payload) < need:
        raise UnsupportedMediaError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=pix_offset
    ).reshape(height, stride)
    px = rows[:, : width * n_channels].reshape(height, width, n_channels)
    if not top_down:
        px = px[::-1]
    # BMP stores BGR(A); return RGB
    rgb = px[:, :, 2::-1] if n_channels >= 3 else px
    return np.ascontiguousarray(rgb[:, :, :3]), n_channels


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an H×W×3 uint8 RGB array as a 24-bpp bottom-up BMP."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected H×W×3 RGB array")
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pixel_bytes = body.tobytes()
    offset = 14 + 40
    header = _BMP_FILE_HEADER.pack(b"BM", offset + len(pixel_bytes), 0, 0, offset)
    info = _BMP_INFO_HEADER.pack(40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + info + pixel_bytes


def _luma(rgb: np.ndarray) -> np.ndarray:
    """Rec. 601 luma in [0, 1] from uint8 RGB."""
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    return (0.299 * r + 0.587 * g + 0.114 * b) / 255.0


def _grid_means(luma: np.ndarray, n: int = 8) -> np.ndarray:
    """n×n block means of a 2-D array (blocks cover the image exactly)."""
    h, w = luma.shape
    row_id = (np.arange(h) * n) // h
    col_id = (np.arange(w) * n) // w
    cell = row_id[:, None] * n + col_id[None, :]
    sums = np.bincount(cell.ravel(), weights=luma.ravel(), minlength=n * n)
    counts = np.bincount(cell.ravel(), minlength=n * n)
    return (sums / counts).reshape(n, n)


def average_hash(rgb: np.ndarray) -> str:
    """8×8 aHash: 64 bits (cell luma > grid mean) as 16 hex chars."""
    grid = _grid_means(_luma(rgb), 8)
    bits = (grid > grid.mean()).ravel()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return f"{val:016x}"


def bmp_features(asset_id: int, payload: bytes) -> dict:
    """IMAGE_FEATURES_SCHEMA row from a real BMP decode."""
    rgb, n_channels = decode_bmp(payload)
    return {
        "asset_id": asset_id,
        "width": rgb.shape[1],
        "height": rgb.shape[0],
        "n_channels": n_channels,
        "mean_luma": round(float(_luma(rgb).mean()), 6),
        "phash": average_hash(rgb),
    }


# --------------------------------------------------------------------------
# PNG — stdlib zlib inflate + numpy unfilter (no codec library needed)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by PNG color type (3 = palette: 1 index per pixel)
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk; validates lengths, ignores CRCs.

    CRC validation is skipped deliberately: featurization wants the pixels
    of slightly-damaged files too, and zlib itself detects corrupt IDAT.
    """
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise UnsupportedMediaError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise UnsupportedMediaError("PNG missing IEND")


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering → (height, stride) uint8 recon array.

    ``stride`` is bytes per scanline (without the filter byte); ``bpp`` is
    bytes per complete pixel. Filters None/Up are whole-row vectorized, Sub
    is a wrapping prefix-sum per byte lane (``np.add.accumulate`` on uint8
    wraps mod 256 — exactly PNG's arithmetic); Average/Paeth need the left
    neighbor so they fall back to a per-pixel-column loop on that row only.
    """
    if len(raw) < height * (stride + 1):
        raise UnsupportedMediaError("truncated PNG scanline data")
    lines = np.frombuffer(raw, dtype=np.uint8, count=height * (stride + 1)).reshape(
        height, stride + 1
    )
    filters = lines[:, 0]
    recon = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(filters[y])
        cur = lines[y, 1:].copy()
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub: wrapping prefix sum within each byte lane
            lanes = cur.reshape(-1, bpp) if stride % bpp == 0 else None
            if lanes is not None:
                np.add.accumulate(lanes, axis=0, dtype=np.uint8, out=lanes)
                cur = lanes.reshape(-1)
            else:  # ragged stride (sub-byte depths) — scalar fallback
                for x in range(bpp, stride):
                    cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            cur += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise UnsupportedMediaError(f"unknown PNG filter {ftype}")
        recon[y] = cur
        prev = cur
    return recon


def decode_png(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an 8-bit non-interlaced PNG → (H×W×3 uint8 RGB, n_channels).

    Color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA)
    are supported at bit depth 8; gray replicates to RGB, palette expands
    through PLTE, and alpha is dropped after decode (featurization reads
    color planes). ``n_channels`` reports the ORIGINAL channel count
    (palette counts as 3). Interlaced (Adam7) and 1/2/4/16-bit files raise
    ``UnsupportedMediaError`` — rare in ML corpora and omitted to keep the
    unfilter kernel byte-aligned.
    """
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise UnsupportedMediaError("not a PNG payload")
    width = height = None
    color_type = bit_depth = None
    palette: np.ndarray | None = None
    idat: list[bytes] = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if interlace != 0:
                raise UnsupportedMediaError("interlaced PNG unsupported")
            if bit_depth != 8 or color_type not in _PNG_SAMPLES:
                raise UnsupportedMediaError(
                    f"unsupported PNG depth/color (bits={bit_depth} ct={color_type})"
                )
        elif ctype == b"PLTE":
            if len(data) % 3:
                raise UnsupportedMediaError("malformed PLTE")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if width is None or not idat:
        raise UnsupportedMediaError("PNG missing IHDR/IDAT")
    if width <= 0 or height <= 0:
        raise UnsupportedMediaError("degenerate PNG dimensions")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise UnsupportedMediaError(f"corrupt PNG IDAT: {e}") from e
    samples = _PNG_SAMPLES[color_type]
    recon = _png_unfilter(raw, height, width * samples, samples)
    px = recon.reshape(height, width, samples)
    if color_type == 0:
        rgb, n_channels = np.repeat(px, 3, axis=2), 1
    elif color_type == 2:
        rgb, n_channels = px, 3
    elif color_type == 3:
        if palette is None:
            raise UnsupportedMediaError("palette PNG missing PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise UnsupportedMediaError("palette index out of range")
        rgb, n_channels = palette[idx], 3
    elif color_type == 4:
        rgb, n_channels = np.repeat(px[:, :, :1], 3, axis=2), 2
    else:  # 6: RGBA
        rgb, n_channels = px[:, :, :3], 4
    return np.ascontiguousarray(rgb), n_channels


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode uint8 gray (H×W), RGB (H×W×3), or RGBA (H×W×4) as PNG.

    ``filter_type`` applies one PNG filter (0–4) to every scanline —
    filters other than 0 exist so round-trip tests exercise every branch
    of ``_png_unfilter`` with spec-conformant input.
    """
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3, 4):
        raise ValueError("expected H×W, H×W×3, or H×W×4 uint8 array")
    h, w, samples = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[samples]
    flat = arr.reshape(h, w * samples).astype(np.int16)
    prev = np.zeros(w * samples, dtype=np.int16)
    body = bytearray()
    for y in range(h):
        cur = flat[y]
        left = np.zeros_like(cur)
        left[samples:] = cur[:-samples]
        upleft = np.zeros_like(prev)
        upleft[samples:] = prev[:-samples]
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - left
        elif filter_type == 2:
            out = cur - prev
        elif filter_type == 3:
            out = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = cur - pred
        else:
            raise ValueError(f"bad filter_type {filter_type}")
        body.append(filter_type)
        body += (out & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + _png_chunk(b"IEND", b"")
    )


def png_features(asset_id: int, payload: bytes) -> dict:
    """IMAGE_FEATURES_SCHEMA row from a real PNG decode."""
    rgb, n_channels = decode_png(payload)
    return {
        "asset_id": asset_id,
        "width": rgb.shape[1],
        "height": rgb.shape[0],
        "n_channels": n_channels,
        "mean_luma": round(float(_luma(rgb).mean()), 6),
        "phash": average_hash(rgb),
    }


def image_features(asset_id: int, payload: bytes) -> dict:
    """Dispatch on magic bytes: BMP or PNG → IMAGE_FEATURES_SCHEMA row."""
    data = payload or b""
    if data[:2] == b"BM":
        return bmp_features(asset_id, data)
    if data[:8] == _PNG_SIG:
        return png_features(asset_id, data)
    raise UnsupportedMediaError("unrecognized image container (not BMP/PNG)")


# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit PCM RIFF/WAVE payload → (sample_rate, mono float64).

    Walks the chunk list (so extra chunks like LIST/fact are fine); channels
    are averaged to mono; samples normalized to [-1, 1).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedMediaError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits != 16 or n_channels < 1:
        raise UnsupportedMediaError(
            f"unsupported WAV encoding (fmt={audio_format} bits={bits})"
        )
    n = len(data) // (2 * n_channels)
    samples = (
        np.frombuffer(data, dtype="<i2", count=n * n_channels)
        .reshape(n, n_channels)
        .astype(np.float64)
        / 32768.0
    )
    return sample_rate, samples.mean(axis=1)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode mono float samples in [-1, 1] as 16-bit PCM RIFF/WAVE."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 32767.0 / 32768.0)
    data = (pcm * 32768.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_features(asset_id: int, payload: bytes) -> dict:
    """AUDIO_FEATURES_SCHEMA row from a real WAV decode."""
    sample_rate, mono = decode_wav(payload)
    duration = len(mono) / float(sample_rate) if sample_rate else 0.0
    rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
    return {
        "asset_id": asset_id,
        "sample_rate": sample_rate,
        "duration_sec": round(duration, 6),
        "rms": round(rms, 6),
    }


# --------------------------------------------------------------------------
# GIF (87a/89a) — container-level frame walk, no pixel decode
# --------------------------------------------------------------------------

def parse_gif_frames(payload: bytes) -> list[dict]:
    """Walk an animated GIF's frame structure without LZW-decoding pixels.

    Returns one dict per frame: ``frame_idx``, placement (``x, y, width,
    height``), ``delay_cs`` (centiseconds, from the preceding Graphic
    Control Extension, 0 if absent), and ``data_sha256`` — the SHA-256 of
    the frame's compressed LZW sub-blocks, a deterministic content
    fingerprint of the actual frame bytes. This is everything frame
    *sampling* needs; pixel decode (LZW + compositing) stays behind
    ``UnsupportedMediaError`` territory for real codec libs.
    """
    import hashlib

    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise UnsupportedMediaError("not a GIF payload")
    pos = 6
    _w, _h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, pos)
    pos += 7
    if packed & 0x80:  # global color table
        pos += 3 * (1 << ((packed & 0x07) + 1))

    frames: list[dict] = []
    delay_cs = 0

    def skip_subblocks(p: int) -> tuple[int, bytes]:
        chunks = []
        while True:
            if p >= len(payload):
                raise UnsupportedMediaError("truncated GIF sub-blocks")
            n = payload[p]
            p += 1
            if n == 0:
                return p, b"".join(chunks)
            chunks.append(payload[p : p + n])
            p += n

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            pos, data = skip_subblocks(pos)
            if label == 0xF9 and len(data) >= 3:  # graphic control
                delay_cs = int.from_bytes(data[1:3], "little")
        elif block == 0x2C:  # image descriptor
            x, y, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if ipacked & 0x80:  # local color table
                pos += 3 * (1 << ((ipacked & 0x07) + 1))
            pos += 1  # LZW minimum code size
            pos, data = skip_subblocks(pos)
            frames.append(
                {
                    "frame_idx": len(frames),
                    "x": x,
                    "y": y,
                    "width": w,
                    "height": h,
                    "delay_cs": delay_cs,
                    "data_sha256": hashlib.sha256(data).hexdigest(),
                }
            )
            delay_cs = 0
        else:
            raise UnsupportedMediaError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise UnsupportedMediaError("GIF contains no image frames")
    return frames


def encode_gif(frames: list[np.ndarray], delay_cs: int = 10) -> bytes:
    """Minimal animated-GIF encoder for fixtures: each frame is an H×W
    uint8 palette-index array (values < 128), LZW-compressed with clear
    codes after every pixel (valid, trivially encodable output)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    for frame in frames:
        fh, fw = frame.shape
        # graphic control extension with the frame delay
        out += bytes((0x21, 0xF9, 0x04, 0x00)) + struct.pack("<H", delay_cs) + bytes((0x00, 0x00))
        out += bytes((0x2C,)) + struct.pack("<HHHHB", 0, 0, fw, fh, 0)
        min_code = 8
        out += bytes((min_code,))
        # LZW stream: emit CLEAR before every literal so codes stay 9 bits
        bits = []
        clear, end = 256, 257
        for px in frame.flatten().tolist():
            bits.append(clear)
            bits.append(int(px))
        bits.append(end)
        acc = 0
        nacc = 0
        data = bytearray()
        for code in bits:
            acc |= code << nacc
            nacc += 9
            while nacc >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
        if nacc:
            data.append(acc & 0xFF)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out += bytes((len(chunk),)) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def wav_spectral_features(asset_id: int, payload: bytes) -> dict:
    """Frequency-domain WAV features via one full-signal real FFT.

    - ``dominant_hz``: frequency of the largest non-DC magnitude bin
      (ties → lowest bin).
    - ``spectral_centroid_hz``: magnitude-weighted mean frequency.
    - ``rolloff85_hz``: lowest frequency below which 85% of the spectral
      energy (|X|²) sits.
    - ``zero_crossing_rate``: sign changes per second in the time domain
      (≈ 2 × f0 for a pure tone — the cheap pitch cross-check).

    numpy's rfft is the only dependency; resolution is sample_rate/N for
    an N-sample clip, so tests assert against bin width, not exact Hz.
    """
    sample_rate, mono = decode_wav(payload)
    n = len(mono)
    if n < 2 or sample_rate <= 0:
        return {
            "asset_id": asset_id,
            "sample_rate": sample_rate,
            "dominant_hz": 0.0,
            "spectral_centroid_hz": 0.0,
            "rolloff85_hz": 0.0,
            "zero_crossing_rate": 0.0,
        }
    mag = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    dom = 1 + int(np.argmax(mag[1:])) if len(mag) > 1 else 0
    total = float(mag.sum())
    centroid = float((freqs * mag).sum() / total) if total > 0 else 0.0
    energy = mag**2
    etot = float(energy.sum())
    if etot > 0:
        roll_idx = int(np.searchsorted(np.cumsum(energy), 0.85 * etot))
        roll = float(freqs[min(roll_idx, len(freqs) - 1)])
    else:
        roll = 0.0
    signs = np.signbit(mono)
    zc = int(np.count_nonzero(signs[1:] != signs[:-1]))
    return {
        "asset_id": asset_id,
        "sample_rate": sample_rate,
        "dominant_hz": round(float(freqs[dom]), 6),
        "spectral_centroid_hz": round(centroid, 6),
        "rolloff85_hz": round(roll, 6),
        "zero_crossing_rate": round(zc * sample_rate / float(n), 6),
    }
