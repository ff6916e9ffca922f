"""Dependency-free media codecs for the multimodal operators.

The container ships no image/audio libraries, so the two formats with
trivially parseable containers are decoded by hand:

- **BMP** (Windows bitmap, ``BITMAPINFOHEADER``, uncompressed 24/32-bpp):
  enough for real width/height/channel extraction, mean luma, and an
  8×8 average-hash perceptual fingerprint.
- **WAV** (RIFF PCM, 16-bit): sample rate, duration, RMS amplitude.

Encoders for both formats are provided too — they generate test fixtures
and power round-trip property tests. Everything is numpy-vectorized; these
functions run inside Arrow-batched ``mapInPandas`` workers
(``operators.multimodal``), so per-element Python overhead is bounded by
the batch count, not the row count.

Formats that genuinely need codec libraries (JPEG/PNG/MP3/MP4) raise
``UnsupportedMediaError`` — the caller decides whether to skip or fail.
"""

from __future__ import annotations

import struct

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
