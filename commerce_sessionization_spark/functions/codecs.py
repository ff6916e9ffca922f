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
- **JPEG** (ITU-T T.81, Huffman): baseline sequential AND progressive
  (SOF2 — spectral selection + successive approximation, EOB runs):
  real entropy decode (16-bit-prefix LUT + restart markers), dequantize,
  batched-matmul 8×8 IDCT, 4:4:4/4:2:2/4:2:0 chroma upsampling, JFIF
  YCbCr→RGB — covers the dominant crawl-corpus image formats,
  dependency-free.
- **WAV** (RIFF PCM, 16-bit): sample rate, duration, RMS amplitude.

Encoders for both formats are provided too — they generate test fixtures
and power round-trip property tests. Everything is numpy-vectorized; these
functions run inside Arrow-batched ``mapInPandas`` workers
(``operators.multimodal``), so per-element Python overhead is bounded by
the batch count, not the row count.

Formats that genuinely need codec libraries (arithmetic-coded JPEG,
WebP, MP3, MP4) raise ``UnsupportedMediaError`` — the caller decides
whether to skip or fail.
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


#: Adam7 pass geometry: (col0, row0, col_step, row_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_subimage(
    raw: bytes, off: int, w: int, h: int, samples: int, depth: int
) -> tuple[np.ndarray, int]:
    """Unfilter one (sub-)image → ((h, w, samples) uint8 sample array,
    bytes consumed). Handles 1/2/4-bit packed rows (single-sample color
    types only), 8-bit, and 16-bit (downsampled to the high byte — the
    standard 16→8 reduction)."""
    if depth == 16:
        stride, bpp = w * samples * 2, samples * 2
    elif depth == 8:
        stride, bpp = w * samples, samples
    else:  # 1/2/4-bit packed: filtering operates on whole bytes
        stride, bpp = (w * samples * depth + 7) // 8, 1
    need = h * (stride + 1)
    recon = _png_unfilter(raw[off : off + need], h, stride, bpp)
    if depth == 16:
        px = recon.reshape(h, w, samples, 2)[:, :, :, 0]
    elif depth == 8:
        px = recon.reshape(h, w, samples)
    else:
        bits = np.unpackbits(recon, axis=1)[:, : (stride * 8)]
        groups = bits[:, : (stride * 8 // depth) * depth].reshape(h, -1, depth)
        weights = 1 << np.arange(depth - 1, -1, -1)
        vals = (groups * weights).sum(axis=2).astype(np.uint8)
        px = vals[:, :w][:, :, None]
    return np.ascontiguousarray(px), need


def _png_pixels(
    raw: bytes, width: int, height: int, samples: int, depth: int,
    interlace: int,
) -> np.ndarray:
    """Full pixel reconstruction: sequential or Adam7 (seven
    independently filtered sub-images scattered onto the output grid)."""
    if interlace == 0:
        px, _ = _png_subimage(raw, 0, width, height, samples, depth)
        return px
    out = np.zeros((height, width, samples), dtype=np.uint8)
    off = 0
    for col0, row0, cstep, rstep in _ADAM7:
        pw = (width - col0 + cstep - 1) // cstep
        ph = (height - row0 + rstep - 1) // rstep
        if pw <= 0 or ph <= 0:
            continue
        px, used = _png_subimage(raw, off, pw, ph, samples, depth)
        off += used
        out[row0::rstep, col0::cstep] = px
    return out


def decode_png(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PNG → (H×W×3 uint8 RGB, n_channels).

    Color types 0 (gray: 1/2/4/8/16-bit), 2 (RGB: 8/16), 3 (palette:
    1/2/4/8), 4 (gray+alpha: 8/16), 6 (RGBA: 8/16), sequential or Adam7
    interlaced; 16-bit samples reduce to the high byte, sub-byte grays
    scale to full range, palette expands through PLTE, and alpha is
    dropped after decode (featurization reads color planes).
    ``n_channels`` reports the ORIGINAL channel count (palette counts
    as 3).
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
            if interlace not in (0, 1):
                raise UnsupportedMediaError("unknown PNG interlace method")
            legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                     4: (8, 16), 6: (8, 16)}
            if color_type not in legal or bit_depth not in legal[color_type]:
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
    px = _png_pixels(raw, width, height, samples, bit_depth, interlace)
    if color_type == 0:
        if bit_depth < 8:  # sub-byte gray scales to full range exactly
            px = px * np.uint8(255 // ((1 << bit_depth) - 1))
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
    """Dispatch on magic bytes: BMP, PNG, JPEG, or lossless WebP →
    IMAGE_FEATURES_SCHEMA row."""
    data = payload or b""
    if data[:2] == b"BM":
        return bmp_features(asset_id, data)
    if data[:8] == _PNG_SIG:
        return png_features(asset_id, data)
    if data[:2] == b"\xff\xd8":
        return jpeg_features(asset_id, data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        # local import: webp.py builds on this module's primitives
        from commerce_sessionization_spark.functions.webp import webp_features

        return webp_features(asset_id, data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        from commerce_sessionization_spark.functions.tiff import tiff_features

        return tiff_features(asset_id, data)
    raise UnsupportedMediaError(
        "unrecognized image container (not BMP/PNG/JPEG/WebP/TIFF)"
    )


# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM RIFF/WAVE payload → (sample_rate, mono float64).

    Handles integer PCM at 8 (unsigned), 16, 24, and 32 bits, IEEE-float
    (format 3, 32/64-bit), and WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping
    either. Walks the chunk list (extra chunks like LIST/fact are fine);
    channels are averaged to mono; samples normalized to [-1, 1).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a RIFF/WAVE payload")
    pos, fmt, fmt_body, data = 12, None, b"", None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedMediaError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format == 0xFFFE and len(fmt_body) >= 26:
        # EXTENSIBLE: the real format is the first 2 bytes of the GUID
        (audio_format,) = struct.unpack_from("<H", fmt_body, 24)
    if n_channels < 1:
        raise UnsupportedMediaError("WAV with zero channels")
    if audio_format == 1:  # integer PCM
        if bits == 16:
            arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 8:  # 8-bit PCM is UNSIGNED per spec
            arr = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        elif bits == 32:
            arr = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        elif bits == 24:  # 3-byte little-endian signed
            usable = len(data) - len(data) % 3
            b3 = np.frombuffer(data, np.uint8, usable).reshape(-1, 3)
            v = (
                b3[:, 0].astype(np.int32)
                | (b3[:, 1].astype(np.int32) << 8)
                | (b3[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            arr = v.astype(np.float64) / float(1 << 23)
        else:
            raise UnsupportedMediaError(f"unsupported PCM width (bits={bits})")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise UnsupportedMediaError(f"bad float WAV width (bits={bits})")
    else:
        raise UnsupportedMediaError(
            f"unsupported WAV encoding (fmt={audio_format} bits={bits})"
        )
    n = len(arr) // n_channels
    samples = arr[: n * n_channels].reshape(n, n_channels)
    return sample_rate, samples.mean(axis=1)


def resample_audio(
    mono: np.ndarray, src_rate: int, dst_rate: int
) -> np.ndarray:
    """Linear-interpolation resample of a mono signal — the cheap,
    dependency-free standardization step before fixed-rate featurizers
    (MFCC frames assume a known rate). Identity when rates match."""
    if src_rate <= 0 or dst_rate <= 0:
        raise ValueError("rates must be positive")
    if src_rate == dst_rate or len(mono) == 0:
        return np.asarray(mono, dtype=np.float64)
    n_out = max(1, int(round(len(mono) * dst_rate / src_rate)))
    x_out = np.arange(n_out) * (src_rate / dst_rate)
    return np.interp(x_out, np.arange(len(mono)), np.asarray(mono, np.float64))


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


def _lzw_decode(data: bytes, min_code: int) -> list[int]:
    """GIF-flavor LZW: LSB-first variable-width codes, 12-bit cap,
    CLEAR/END control codes (GIF89a appendix F). Returns palette indices.

    Table entries are prefix-chain arrays (prefix code, last symbol,
    first symbol) instead of materialized sequences — emitting a code
    walks its chain once, so total work is linear in output size. The
    naive tuple-table alternative copies the whole prefix on every add,
    which goes quadratic on long matches (measured 5× slower on
    512×512 frames).
    """
    if not 2 <= min_code <= 11:
        raise UnsupportedMediaError(f"bad GIF LZW min code size {min_code}")
    clear = 1 << min_code
    end = clear + 1
    prefix = [0] * 4096
    last = list(range(clear)) + [0] * (4096 - clear)
    first = list(range(clear)) + [0] * (4096 - clear)
    code_size = min_code + 1
    next_code = end + 1
    acc = nacc = pos = 0
    out: list[int] = []
    prev = -1  # previous code, -1 right after CLEAR
    n = len(data)
    tmp: list[int] = []

    def expand(code: int) -> None:
        """Append code's expansion to ``out`` via its prefix chain."""
        tmp.clear()
        c = code
        while c > end:  # dynamic entry
            tmp.append(last[c])
            c = prefix[c]
        tmp.append(c)  # root symbol
        out.extend(reversed(tmp))

    while True:
        while nacc < code_size and pos < n:
            acc |= data[pos] << nacc
            nacc += 8
            pos += 1
        if nacc < code_size:
            break  # stream exhausted without END — tolerate (common in wild)
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nacc -= code_size
        if code == clear:
            code_size = min_code + 1
            next_code = end + 1
            prev = -1
            continue
        if code == end:
            break
        if code < next_code and code != end and code != clear:
            if prev < 0:  # first code after CLEAR: must be a root
                if code >= clear:
                    raise UnsupportedMediaError("corrupt GIF LZW stream")
                out.append(code)
                prev = code
                continue
            expand(code)
            new_last = first[code]
        elif code == next_code and prev >= 0:  # KwKwK
            expand(prev)
            out.append(first[prev])
            new_last = first[prev]
        else:
            raise UnsupportedMediaError("corrupt GIF LZW code sequence")
        if next_code < 4096:
            prefix[next_code] = prev
            last[next_code] = new_last
            first[next_code] = first[prev]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> tuple[list[np.ndarray], list[int]]:
    """Full GIF pixel decode → (list of H×W×3 uint8 RGB frames, delays).

    Real LZW decompression (variable-width LSB-first codes), global and
    local color tables, Adam-style interlacing, transparency, and frame
    compositing onto the logical screen: disposal 0/1 leave the frame,
    2 restores the background rectangle, 3 restores the previous canvas.
    Every frame returned is the full composited canvas — what a vision
    model would see — with ``delay_cs`` per frame alongside.
    """
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise UnsupportedMediaError("not a GIF payload")
    pos = 6
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, pos)
    pos += 7
    if sw <= 0 or sh <= 0:
        raise UnsupportedMediaError("degenerate GIF dimensions")
    global_pal: np.ndarray | None = None
    if packed & 0x80:
        npal = 1 << ((packed & 0x07) + 1)
        global_pal = np.frombuffer(
            payload, np.uint8, 3 * npal, pos
        ).reshape(-1, 3)
        pos += 3 * npal

    def subblocks(p: int) -> tuple[int, bytes]:
        chunks = []
        while True:
            if p >= len(payload):
                raise UnsupportedMediaError("truncated GIF sub-blocks")
            ln = payload[p]
            p += 1
            if ln == 0:
                return p, b"".join(chunks)
            chunks.append(payload[p : p + ln])
            p += ln

    if global_pal is not None and bg_idx < len(global_pal):
        canvas = np.tile(global_pal[bg_idx], (sh, sw, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    delay_cs = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            pos, data = subblocks(pos)
            if label == 0xF9 and len(data) >= 4:
                gpacked = data[0]
                delay_cs = int.from_bytes(data[1:3], "little")
                disposal = (gpacked >> 2) & 0x07
                transparent = data[3] if gpacked & 0x01 else None
        elif block == 0x2C:  # image descriptor
            x, y, fw, fh, ipacked = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            pal = global_pal
            if ipacked & 0x80:
                npal = 1 << ((ipacked & 0x07) + 1)
                pal = np.frombuffer(
                    payload, np.uint8, 3 * npal, pos
                ).reshape(-1, 3)
                pos += 3 * npal
            if pal is None:
                raise UnsupportedMediaError("GIF frame has no color table")
            min_code = payload[pos]
            pos += 1
            pos, data = subblocks(pos)
            idx = _lzw_decode(data, min_code)
            if len(idx) < fw * fh:
                raise UnsupportedMediaError("GIF frame pixel data short")
            grid = np.asarray(idx[: fw * fh], dtype=np.uint16).reshape(fh, fw)
            if ipacked & 0x40:  # interlaced: reorder rows by pass
                rows = []
                for start, step in _GIF_INTERLACE_PASSES:
                    rows.extend(range(start, fh, step))
                deinter = np.empty_like(grid)
                deinter[np.asarray(rows)] = grid
                grid = deinter
            if int(grid.max(initial=0)) >= len(pal):
                raise UnsupportedMediaError("GIF palette index out of range")
            before = canvas.copy() if disposal == 3 else None
            x2, y2 = min(x + fw, sw), min(y + fh, sh)
            region = canvas[y:y2, x:x2]
            vis_grid = grid[: y2 - y, : x2 - x]
            rgb = pal[vis_grid]
            if transparent is not None:
                mask = (vis_grid != transparent)[:, :, None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            delays.append(delay_cs)
            if disposal == 2:  # restore background in the frame rect
                if global_pal is not None and bg_idx < len(global_pal):
                    canvas[y:y2, x:x2] = global_pal[bg_idx]
                else:
                    canvas[y:y2, x:x2] = 0
            elif disposal == 3 and before is not None:
                canvas = before
            delay_cs, transparent, disposal = 0, None, 0
        else:
            raise UnsupportedMediaError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise UnsupportedMediaError("GIF contains no image frames")
    return frames, delays


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


# --------------------------------------------------------------------------
# JPEG (ITU-T T.81 baseline sequential DCT, Huffman-coded)
# --------------------------------------------------------------------------
#
# Real decode, no codec library: marker walk (SOI/APPn/DQT/SOF0/SOF1/DHT/
# DRI/SOS), canonical-Huffman entropy decode with byte-unstuffing and
# restart-marker support, dequantize + dezigzag, vectorized 8×8 IDCT (one
# numpy einsum over every block of a component at once), generic chroma
# upsampling for the standard 4:4:4 / 4:2:2 / 4:2:0 samplings, and JFIF
# YCbCr→RGB. Progressive (SOF2), arithmetic-coded (SOF9+), hierarchical,
# and 12-bit variants raise ``UnsupportedMediaError`` — baseline sequential
# is the overwhelming majority of crawl-corpus JPEGs.
#
# The encoder exists for fixtures and round-trip tests (the same role
# ``encode_gif`` plays): 4:4:4 or 4:2:0, a flat quantization table
# (``quant=1`` → near-lossless, so tests can bound per-pixel error), and a
# deliberately trivial-but-valid Huffman table (every symbol coded in 9
# bits, symbol 0xFF at 10) — poor compression, spec-conformant output,
# zero table-recall risk. Optional restart intervals exercise the
# decoder's RST path.

_ZIGZAG = [
    (r, c)
    for s in range(15)
    for r, c in (
        [(min(s, 7) - i, s - min(s, 7) + i) for i in range(min(s, 14 - s) + 1)]
        if s % 2 == 0
        else [(s - min(s, 7) + i, min(s, 7) - i) for i in range(min(s, 14 - s) + 1)]
    )
]
_ZIG_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZIG_COLS = np.array([c for _, c in _ZIGZAG])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis: F = C·f·Cᵀ, f = Cᵀ·F·C."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    c[0] /= np.sqrt(2.0)
    return c


_DCT_C = _dct_matrix()


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment.

    The segment is zero-padded by 4 bytes so ``peek16`` can always read a
    full window; ``nbits`` still bounds real consumption.
    """

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data + b"\x00\x00\x00\x00"
        self.pos = 0
        self.nbits = len(data) * 8

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > self.nbits:
            raise UnsupportedMediaError("truncated JPEG entropy data")
        b0, b1 = self.pos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.data[b0:b1], "big")
        self.pos = end
        return (chunk >> (b1 * 8 - end)) & ((1 << n) - 1)

    def peek16(self) -> int:
        b0 = self.pos >> 3
        chunk = int.from_bytes(self.data[b0 : b0 + 3], "big")
        return (chunk >> (8 - (self.pos & 7))) & 0xFFFF


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """DHT (16 length counts + symbols) → {(length, code): symbol}.

    Canonical assignment per T.81 C.2; the prefix property makes the
    (length, prefix) pair an unambiguous lookup key during decode.
    """
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huffman_lut(table: dict[tuple[int, int], int]) -> tuple[list, list]:
    """Flatten a canonical table into 2^16-entry (symbol, length) lists:
    the decoder peeks 16 bits and resolves any code in ONE lookup instead
    of a bit-at-a-time walk — the hot-path fix that took the pure-Python
    entropy decode from ~1 to several MP/s per core. Plain Python lists
    index faster than numpy arrays for scalar access."""
    syms = [0] * 65536
    lens = [0] * 65536
    for (length, code), sym in table.items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        syms[lo:hi] = [sym] * (hi - lo)
        lens[lo:hi] = [length] * (hi - lo)
    return syms, lens


def _huff_decode(reader: _BitReader, lut: tuple[list, list]) -> int:
    syms, lens = lut
    window = reader.peek16()
    length = lens[window]
    if length == 0 or reader.pos + length > reader.nbits:
        raise UnsupportedMediaError("invalid JPEG Huffman code")
    reader.pos += length
    return syms[window]


def _decode_block(
    reader: _BitReader,
    dc_lut: tuple[list, list],
    ac_lut: tuple[list, list],
    pred: int,
) -> tuple[list[int], int]:
    """Entropy-decode one 8×8 block → (zigzag coefficient list, new DC
    predictor). The hot path of the whole decoder: everything is local
    variables, and each coefficient costs ONE 5-byte fetch — 40 bits
    covers the longest code (16) plus the longest extend field (11) at
    any bit phase — resolved through the 16-bit-prefix LUT."""
    data = reader.data
    pos = reader.pos
    nbits = reader.nbits
    dsyms, dlens = dc_lut
    asyms, alens = ac_lut
    zz = [0] * 64

    b = pos >> 3
    chunk = int.from_bytes(data[b : b + 5], "big")
    phase = pos & 7
    window = (chunk >> (24 - phase)) & 0xFFFF
    length = dlens[window]
    if length == 0 or pos + length > nbits:
        raise UnsupportedMediaError("invalid JPEG Huffman code")
    s = dsyms[window]
    if s > 11:
        raise UnsupportedMediaError("bad JPEG DC size")
    if s:
        if pos + length + s > nbits:
            raise UnsupportedMediaError("truncated JPEG entropy data")
        v = (chunk >> (40 - phase - length - s)) & ((1 << s) - 1)
        pred += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
    pos += length + s
    zz[0] = pred

    k = 1
    while k < 64:
        b = pos >> 3
        chunk = int.from_bytes(data[b : b + 5], "big")
        phase = pos & 7
        window = (chunk >> (24 - phase)) & 0xFFFF
        length = alens[window]
        if length == 0 or pos + length > nbits:
            raise UnsupportedMediaError("invalid JPEG Huffman code")
        rs = asyms[window]
        s = rs & 0x0F
        if s == 0:
            pos += length
            if rs == 0xF0:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += rs >> 4
        if k > 63:
            raise UnsupportedMediaError("JPEG AC run overflow")
        if pos + length + s > nbits:
            raise UnsupportedMediaError("truncated JPEG entropy data")
        v = (chunk >> (40 - phase - length - s)) & ((1 << s) - 1)
        zz[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        pos += length + s
        k += 1
    reader.pos = pos
    return zz, pred


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a SIZE-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _split_scan(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``pos`` → unstuffed segments split at RSTn.

    Returns (segments, position of the next non-RST marker's 0xFF byte).
    0xFF00 unstuffs to 0xFF; 0xFFD0–D7 starts a new segment.
    """
    segments: list[bytes] = []
    cur = bytearray()
    i = int(pos)
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = payload[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:  # a real marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, i


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(N, 8, 8) dequantized coefficients → (N, 8, 8) float samples.

    Two broadcast matmuls (BLAS-batched) — ~6× faster than the
    equivalent three-operand einsum on thousands of blocks."""
    return (_DCT_C.T @ coeffs) @ _DCT_C


def _prog_dc_scan(
    segments: list[bytes],
    scan_comps: list[tuple],
    geom: dict,
    grids: dict[int, np.ndarray],
    htables: dict,
    Ah: int,
    Al: int,
    restart_interval: int,
) -> None:
    """Progressive DC scan (T.81 G.1.2.1): first pass (Ah=0) entropy-
    decodes DC diffs scaled by 2^Al; refinement (Ah>0) appends one raw
    bit per block. Interleaved (multi-component, MCU order) or
    non-interleaved (single component, raster block order)."""
    interleaved = len(scan_comps) > 1
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = {c[0]: 0 for c in scan_comps}
    if interleaved:
        units = geom["mcus_x"] * geom["mcus_y"]
    else:
        cid, ch, cv, _tq, td, _ta = scan_comps[0]
        bw, bh = geom["comp_blocks"][cid]
        units = bw * bh
    for unit in range(units):
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise UnsupportedMediaError("JPEG missing restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = {c[0]: 0 for c in scan_comps}
        if interleaved:
            my, mx = divmod(unit, geom["mcus_x"])
            targets = [
                (c, grids[c[0]][my * c[2] + vy, mx * c[1] + vx])
                for c in scan_comps
                for vy in range(c[2])
                for vx in range(c[1])
            ]
        else:
            c = scan_comps[0]
            bw, _bh = geom["comp_blocks"][c[0]]
            by, bx = divmod(unit, bw)
            targets = [(c, grids[c[0]][by, bx])]
        for c, zz in targets:
            if Ah == 0:
                dc_lut = htables.get((0, c[4]))
                if dc_lut is None:
                    raise UnsupportedMediaError("JPEG missing DC table")
                size = _huff_decode(reader, dc_lut)
                if size > 11:
                    raise UnsupportedMediaError("bad JPEG DC size")
                preds[c[0]] += _extend(reader.read_bits(size), size)
                zz[0] = preds[c[0]] << Al
            else:
                if reader.read_bits(1):
                    zz[0] = int(zz[0]) | (1 << Al)


def _prog_ac_scan(
    segments: list[bytes],
    comp: tuple,
    geom: dict,
    grid: np.ndarray,
    ac_lut: tuple,
    Ss: int,
    Se: int,
    Ah: int,
    Al: int,
    restart_interval: int,
) -> None:
    """Progressive AC scan over one component's spectral band [Ss, Se]
    (T.81 G.1.2.2–G.1.2.3): first pass places coefficients scaled by
    2^Al with EOB-run coding; refinement appends one correction bit per
    already-nonzero coefficient and ±2^Al for newly significant ones.
    Mirrors the classic libjpeg control flow, which is the de-facto
    conformance reference."""
    bw, bh = geom["comp_blocks"][comp[0]]
    p1, m1 = 1 << Al, -1 << Al
    seg_idx = 0
    reader = _BitReader(segments[0])
    eobrun = 0
    for unit in range(bw * bh):
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise UnsupportedMediaError("JPEG missing restart segment")
            reader = _BitReader(segments[seg_idx])
            eobrun = 0
        by, bx = divmod(unit, bw)
        zz = grid[by, bx]
        if Ah == 0:  # first pass for this band
            if eobrun > 0:
                eobrun -= 1
                continue
            k = Ss
            while k <= Se:
                rs = _huff_decode(reader, ac_lut)
                r, s = rs >> 4, rs & 0x0F
                if s:
                    k += r
                    if k > Se:
                        raise UnsupportedMediaError("JPEG AC run overflow")
                    zz[k] = _extend(reader.read_bits(s), s) << Al
                    k += 1
                else:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += 16
        else:  # refinement pass
            k = Ss
            if eobrun == 0:
                while k <= Se:
                    rs = _huff_decode(reader, ac_lut)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        newval = 0  # ZRL: pass over 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise UnsupportedMediaError(
                                "corrupt JPEG AC refinement"
                            )
                        newval = p1 if reader.read_bits(1) else m1
                    while k <= Se:
                        c = int(zz[k])
                        if c != 0:
                            if reader.read_bits(1) and (c & p1) == 0:
                                zz[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s and k <= Se:
                        zz[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= Se:
                    c = int(zz[k])
                    if c != 0 and reader.read_bits(1) and (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1


def decode_jpeg(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG →
    (H×W×3 uint8 RGB, n_channels).

    Huffman-coded, 8-bit, 1- or 3-component frames, any sampling whose
    factors divide the max (covers 4:4:4, 4:2:2, 4:2:0), restart
    intervals, and the full progressive feature set: spectral selection
    AND successive approximation (DC/AC first + refinement scans, EOB
    runs). Grayscale replicates to RGB with ``n_channels=1``.
    Arithmetic-coded/12-bit/lossless/hierarchical files raise
    ``UnsupportedMediaError``.
    """
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise UnsupportedMediaError("not a JPEG payload")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}  # (class, id) -> LUT
    frame = None  # (H, W, [(cid, h, v, tq), ...])
    progressive = False
    restart_interval = 0
    pos = 2
    n = len(payload)
    geom: dict | None = None
    grids: dict[int, np.ndarray] = {}
    scans_done = 0
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise UnsupportedMediaError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # no-length markers
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        if seg_len < 2 or pos + seg_len > n:
            raise UnsupportedMediaError("truncated JPEG segment")
        body = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                width_ = 64 if pq == 0 else 128
                if off + width_ > len(body):
                    raise UnsupportedMediaError("truncated JPEG DQT")
                if pq == 0:
                    q = np.frombuffer(body, np.uint8, 64, off).astype(np.int32)
                else:
                    q = np.frombuffer(body, ">u2", 64, off).astype(np.int32)
                off += width_
                qtables[tq] = q
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if len(body) < 6 or len(body) < 6 + 3 * body[5]:
                raise UnsupportedMediaError("truncated JPEG SOF")
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise UnsupportedMediaError(f"{prec}-bit JPEG unsupported")
            progressive = marker == 0xC2
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedMediaError(
                f"unsupported JPEG coding (SOF marker 0x{marker:02x}: "
                "arithmetic/lossless/hierarchical)"
            )
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nsyms = sum(bits)
                vals = body[off + 17 : off + 17 + nsyms]
                htables[(tc, th)] = _huffman_lut(_build_huffman(bits, vals))
                off += 17 + nsyms
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise UnsupportedMediaError("JPEG SOS before SOF")
            height, width, comps = frame
            if height <= 0 or width <= 0:
                raise UnsupportedMediaError("degenerate JPEG dimensions")
            if geom is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                for cid, ch, cv, tq in comps:
                    if hmax % ch or vmax % cv:
                        raise UnsupportedMediaError(
                            "non-integer JPEG sampling ratio"
                        )
                mcus_x = -(-width // (8 * hmax))
                mcus_y = -(-height // (8 * vmax))
                # true (non-MCU-padded) block dims per component — the
                # traversal extent of non-interleaved progressive scans
                comp_blocks = {}
                for cid, ch, cv, tq in comps:
                    cw = -(-width * ch // hmax)   # ceil(width·h/hmax)
                    chh = -(-height * cv // vmax)
                    comp_blocks[cid] = (-(-cw // 8), -(-chh // 8))
                geom = {
                    "hmax": hmax,
                    "vmax": vmax,
                    "mcus_x": mcus_x,
                    "mcus_y": mcus_y,
                    "comp_blocks": comp_blocks,
                }
                for cid, ch, cv, tq in comps:
                    grids[cid] = np.zeros(
                        (mcus_y * cv, mcus_x * ch, 64), dtype=np.int32
                    )
            ns = body[0]
            by_id = {c[0]: c for c in comps}
            scan_comps = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                if cs not in by_id:
                    raise UnsupportedMediaError(
                        "JPEG scan references unknown component"
                    )
                cid, ch, cv, tq = by_id[cs]
                scan_comps.append((cid, ch, cv, tq, tdta >> 4, tdta & 0x0F))
            Ss, Se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            Ah, Al = a >> 4, a & 0x0F
            segments, pos = _split_scan(payload, pos + seg_len)
            if not progressive:
                if scans_done:
                    raise UnsupportedMediaError(
                        "multi-scan baseline JPEG unsupported"
                    )
                if len(scan_comps) != len(comps):
                    raise UnsupportedMediaError(
                        "baseline scan must cover every component"
                    )
                seg_idx = 0
                reader = _BitReader(segments[0])
                preds = {c[0]: 0 for c in scan_comps}
                tabs = {}
                for c in scan_comps:
                    if (0, c[4]) not in htables or (1, c[5]) not in htables:
                        raise UnsupportedMediaError("JPEG missing Huffman table")
                    tabs[c[0]] = (htables[(0, c[4])], htables[(1, c[5])])
                for mcu in range(geom["mcus_x"] * geom["mcus_y"]):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        seg_idx += 1
                        if seg_idx >= len(segments):
                            raise UnsupportedMediaError(
                                "JPEG missing restart segment"
                            )
                        reader = _BitReader(segments[seg_idx])
                        preds = {c[0]: 0 for c in scan_comps}
                    my, mx = divmod(mcu, geom["mcus_x"])
                    for cid, ch, cv, tq, _td, _ta in scan_comps:
                        dc_tab, ac_tab = tabs[cid]
                        grid = grids[cid]
                        for vy in range(cv):
                            for vx in range(ch):
                                zz, preds[cid] = _decode_block(
                                    reader, dc_tab, ac_tab, preds[cid]
                                )
                                grid[my * cv + vy, mx * ch + vx] = zz
            else:
                if Ss == 0:
                    if Se != 0:
                        raise UnsupportedMediaError("bad progressive DC scan")
                    _prog_dc_scan(
                        segments, scan_comps, geom, grids, htables, Ah, Al,
                        restart_interval,
                    )
                else:
                    if len(scan_comps) != 1 or not 1 <= Ss <= Se <= 63:
                        raise UnsupportedMediaError("bad progressive AC scan")
                    c = scan_comps[0]
                    ac_lut = htables.get((1, c[5]))
                    if ac_lut is None:
                        raise UnsupportedMediaError("JPEG missing AC table")
                    _prog_ac_scan(
                        segments, c, geom, grids[c[0]], ac_lut,
                        Ss, Se, Ah, Al, restart_interval,
                    )
            scans_done += 1
            continue  # pos already advanced past the entropy data
        pos += seg_len
    if frame is None or scans_done == 0 or geom is None:
        raise UnsupportedMediaError("JPEG missing SOF/SOS")
    height, width, comps = frame
    if len(comps) not in (1, 3):
        raise UnsupportedMediaError(
            f"{len(comps)}-component JPEG unsupported (CMYK/Adobe needs a "
            "color-management library)"
        )
    hmax, vmax = geom["hmax"], geom["vmax"]
    planes: dict[int, np.ndarray] = {}
    for cid, ch, cv, tq in comps:
        if tq not in qtables:
            raise UnsupportedMediaError("JPEG missing quant table")
        grid = grids[cid]
        bh, bw = grid.shape[:2]
        blocks = np.zeros((bh * bw, 8, 8), dtype=np.float64)
        # dequantize HERE, once per component over the whole block grid,
        # instead of a per-block multiply inside the MCU loop
        blocks[:, _ZIG_ROWS, _ZIG_COLS] = grid.reshape(bh * bw, 64) * qtables[tq]
        px = _idct_blocks(blocks) + 128.0
        plane = (
            px.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes[cid] = plane[:height, :width]
    if len(comps) == 1:
        y = np.clip(np.round(next(iter(planes.values()))), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2)), 1
    y_id, cb_id, cr_id = (c[0] for c in comps)
    y, cb, cr = planes[y_id], planes[cb_id] - 128.0, planes[cr_id] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.ascontiguousarray(
        np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    ), 3


class _BitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nacc -= 8
            self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)


#: fixture Huffman table: symbols 0x00–0xFE at 9 bits, 0xFF at 10 — valid
#: canonical lengths (Kraft sum 255/512 + 1/1024 < 1), no all-ones code.
_ENC_BITS = [0] * 8 + [255, 1] + [0] * 6
_ENC_VALS = bytes(range(256))


def _enc_code(sym: int) -> tuple[int, int]:
    return (sym, 9) if sym < 255 else (510, 10)


def _dht_segment() -> bytes:
    body = b""
    for tc in (0, 1):
        body += bytes([tc << 4]) + bytes(_ENC_BITS) + _ENC_VALS
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _csize(v: int) -> int:
    """Bit category of a signed coefficient (T.81 table F.1)."""
    return int(abs(v)).bit_length()


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int) -> int:
    diff = int(zz[0]) - pred
    s = _csize(diff)
    c, length = _enc_code(s)
    w.write(c, length)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    k, run = 1, 0
    while k <= last_nz:
        v = int(zz[k])
        if v == 0:
            run += 1
        else:
            while run >= 16:
                c, length = _enc_code(0xF0)  # ZRL
                w.write(c, length)
                run -= 16
            s = _csize(v)
            c, length = _enc_code((run << 4) | s)
            w.write(c, length)
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        k += 1
    if last_nz < 63:
        c, length = _enc_code(0x00)  # EOB
        w.write(c, length)
    return int(zz[0])


def _plane_blocks(plane: np.ndarray, quant: int) -> np.ndarray:
    """Edge-pad a plane to 8-multiples, FDCT+quantize every 8×8 block →
    (blocks_y, blocks_x, 64) zigzag coefficients."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    f = padded.astype(np.float64) - 128.0
    blocks = (
        f.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coeffs = (_DCT_C @ blocks) @ _DCT_C.T
    q = np.round(coeffs / float(quant)).astype(np.int32)
    zz = q[:, _ZIG_ROWS, _ZIG_COLS]
    return zz.reshape(ph // 8, pw // 8, 64)


def encode_jpeg(
    img: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 gray (H×W) or RGB (H×W×3) as baseline JPEG.

    Fixture-grade by design (cf. ``encode_gif``): flat quantization table
    filled with ``quant`` (1 → near-lossless so round-trip tests can bound
    per-pixel error), trivial 9-bit Huffman table, 4:4:4 by default or
    4:2:0 with ``subsample=True`` (2×2-mean chroma), optional restart
    intervals (in MCUs) to exercise the decoder's RST path.
    """
    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expected H×W gray or H×W×3 RGB uint8 array")
    if not 1 <= quant <= 255:
        raise ValueError("quant must be in [1, 255]")
    h, w = arr.shape[:2]
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([quant] * 64)
    if gray:
        comps = [(1, 1, 1)]
        planes = [arr.astype(np.float64)]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def halve(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return 0.25 * (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
            comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
            planes = [y, halve(cb), halve(cr)]
        else:
            comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
            planes = [y, cb, cr]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for (cid, ch, cv), _ in zip(comps, planes):
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment()
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for (cid, _, _), _ in zip(comps, planes):
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    grids = []
    for (cid, ch, cv), plane in zip(comps, planes):
        grid = _plane_blocks(plane, quant)
        need_y, need_x = mcus_y * cv, mcus_x * ch
        gy, gx = grid.shape[:2]
        if gy < need_y or gx < need_x:  # pad block grid to whole MCUs
            grid = np.pad(
                grid, ((0, need_y - gy), (0, need_x - gx), (0, 0)), mode="edge"
            )
        grids.append(grid)
    writer = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            writer = _BitWriter()
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, ((cid, ch, cv), grid) in enumerate(zip(comps, grids)):
            for vy in range(cv):
                for vx in range(ch):
                    preds[ci] = _encode_block(
                        writer, grid[my * cv + vy, mx * ch + vx], preds[ci]
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_features(asset_id: int, payload: bytes) -> dict:
    """IMAGE_FEATURES_SCHEMA row from a real baseline-JPEG decode."""
    rgb, n_channels = decode_jpeg(payload)
    return {
        "asset_id": asset_id,
        "width": rgb.shape[1],
        "height": rgb.shape[0],
        "n_channels": n_channels,
        "mean_luma": round(float(_luma(rgb).mean()), 6),
        "phash": average_hash(rgb),
    }


def _mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int
) -> np.ndarray:
    """Triangular mel filterbank (n_mels, n_fft//2 + 1), HTK mel scale
    ``mel = 2595·log10(1 + f/700)``, filters spanning 0 Hz → Nyquist."""
    nyq = sample_rate / 2.0
    mel_max = 2595.0 * np.log10(1.0 + nyq / 700.0)
    mel_pts = np.linspace(0.0, mel_max, n_mels + 2)
    hz_pts = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    bins = np.floor((n_fft + 1) * hz_pts / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        if ctr == lo:
            ctr += 1
        if hi == ctr:
            hi += 1
        fb[m - 1, lo:ctr] = (np.arange(lo, ctr) - lo) / (ctr - lo)
        fb[m - 1, ctr:hi] = (hi - np.arange(ctr, hi)) / (hi - ctr)
    return fb


def wav_mfcc(
    payload: bytes,
    n_mfcc: int = 13,
    n_mels: int = 26,
    frame_len: int = 400,
    hop: int = 160,
    floor_db: float = -60.0,
) -> tuple[int, np.ndarray]:
    """MFCCs of a PCM-WAV payload → (n_frames, (n_frames, n_mfcc) array).

    The standard recipe, all vectorized numpy: pre-emphasis (0.97),
    Hamming-windowed overlapping frames (default 25 ms / 10 ms at
    16 kHz), |rfft|² power spectrum, triangular mel filterbank on the
    HTK scale, log with a ``floor_db`` dynamic-range floor relative to
    the clip's peak mel energy (librosa's ``top_db`` idea — without it,
    near-silent bands track the source's quantization-noise floor and
    an 8-bit and a 16-bit recording of the SAME audio fingerprint far
    apart), then an orthonormal DCT-II over the mel axis keeping the
    first ``n_mfcc`` coefficients. One matmul chain per payload — no
    per-frame Python loop.
    """
    sample_rate, mono = decode_wav(payload)
    if len(mono) < frame_len:
        return 0, np.zeros((0, n_mfcc))
    emph = np.empty_like(mono)
    emph[0] = mono[0]
    emph[1:] = mono[1:] - 0.97 * mono[:-1]
    n_frames = 1 + (len(emph) - frame_len) // hop
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = emph[idx] * np.hamming(frame_len)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2 / frame_len
    fb = _mel_filterbank(n_mels, frame_len, sample_rate)
    mel = power @ fb.T
    floor = max(1e-10, float(mel.max(initial=0.0)) * 10.0 ** (floor_db / 10.0))
    logmel = np.log(np.maximum(mel, floor))
    # orthonormal DCT-II basis over the mel axis
    k = np.arange(n_mfcc)[:, None]
    m = np.arange(n_mels)[None, :]
    basis = np.cos(np.pi * k * (2 * m + 1) / (2.0 * n_mels)) * np.sqrt(2.0 / n_mels)
    basis[0] /= np.sqrt(2.0)
    return n_frames, logmel @ basis.T


def wav_mfcc_features(asset_id: int, payload: bytes, n_mfcc: int = 13) -> dict:
    """AUDIO_MFCC_SCHEMA row: per-asset mean and std of frame MFCCs —
    the fixed-size audio fingerprint similarity/dedup ops consume."""
    n_frames, mfcc = wav_mfcc(payload, n_mfcc=n_mfcc)
    if n_frames == 0:
        zero = [0.0] * n_mfcc
        return {
            "asset_id": asset_id,
            "n_frames": 0,
            "mfcc_mean": zero,
            "mfcc_std": zero,
        }
    return {
        "asset_id": asset_id,
        "n_frames": int(n_frames),
        "mfcc_mean": [round(float(v), 6) for v in mfcc.mean(axis=0)],
        "mfcc_std": [round(float(v), 6) for v in mfcc.std(axis=0)],
    }


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
