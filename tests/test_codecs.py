"""Dependency-free BMP/WAV codecs: round-trip and known-value tests.

Pure numpy — no Spark session needed; the Spark-side wiring is covered by
``tests/test_operators.py::TestMultimodal``.
"""

from __future__ import annotations

import numpy as np
import pytest

from commerce_sessionization_spark.functions.codecs import (
    UnsupportedMediaError,
    average_hash,
    bmp_features,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    wav_features,
)


def gradient_rgb(h: int = 24, w: int = 32) -> np.ndarray:
    """Deterministic test image: horizontal R ramp, vertical G ramp."""
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img[:, :, 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    img[:, :, 2] = 40
    return img


class TestBmp:
    def test_round_trip_exact(self):
        img = gradient_rgb()
        decoded, n_channels = decode_bmp(encode_bmp(img))
        assert n_channels == 3
        np.testing.assert_array_equal(decoded, img)

    def test_round_trip_odd_width_padding(self):
        # width 7 → row stride 24 ≠ 21: exercises the 4-byte padding path
        img = gradient_rgb(h=5, w=7)
        decoded, _ = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(decoded, img)

    def test_features_known_values(self):
        # solid mid-gray: luma == 128/255, aHash all-zero (no cell > mean)
        img = np.full((16, 16, 3), 128, dtype=np.uint8)
        feats = bmp_features(7, encode_bmp(img))
        assert feats["asset_id"] == 7
        assert (feats["width"], feats["height"], feats["n_channels"]) == (16, 16, 3)
        assert feats["mean_luma"] == pytest.approx(128 / 255, abs=1e-6)
        assert feats["phash"] == "0" * 16

    def test_ahash_splits_light_dark(self):
        # left half black, right half white → 0f0f… pattern per row
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:, 8:] = 255
        assert average_hash(img) == "0f" * 8

    def test_rejects_non_bmp(self):
        for payload in (b"", b"\x89PNG not a bmp", b"BMtooshort"):
            with pytest.raises(UnsupportedMediaError):
                decode_bmp(payload)

    def test_rejects_compressed_bmp(self):
        raw = bytearray(encode_bmp(gradient_rgb(8, 8)))
        raw[30] = 1  # BI_RLE8 compression flag
        with pytest.raises(UnsupportedMediaError):
            decode_bmp(bytes(raw))


class TestWav:
    def test_round_trip_sine(self):
        rate = 8000
        t = np.arange(rate // 2) / rate  # 0.5 s
        samples = 0.5 * np.sin(2 * np.pi * 440 * t)
        got_rate, mono = decode_wav(encode_wav(samples, rate))
        assert got_rate == rate
        assert len(mono) == len(samples)
        # 16-bit quantization error only
        np.testing.assert_allclose(mono, samples, atol=1.0 / 32768)

    def test_features_known_values(self):
        # full-scale square wave → RMS ≈ amplitude, duration exact
        rate = 16000
        samples = np.tile([0.5, -0.5], rate)  # 2 s
        feats = wav_features(3, encode_wav(samples, rate))
        assert feats["asset_id"] == 3
        assert feats["sample_rate"] == rate
        assert feats["duration_sec"] == pytest.approx(2.0)
        assert feats["rms"] == pytest.approx(0.5, abs=1e-4)

    def test_chunk_walker_skips_extra_chunks(self):
        # LIST chunk between fmt and data must be skipped, not break parse
        import struct

        body = encode_wav(np.zeros(100), 8000)
        fmt_end = 12 + 8 + 16
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        payload = body[:fmt_end] + extra + body[fmt_end:]
        payload = payload[:4] + struct.pack("<I", len(payload) - 8) + payload[8:]
        rate, mono = decode_wav(payload)
        assert rate == 8000 and len(mono) == 100

    def test_rejects_non_wav(self):
        for payload in (b"", b"RIFF1234WAVX", b"ID3 mp3 bytes"):
            with pytest.raises(UnsupportedMediaError):
                decode_wav(payload)


def test_gif_roundtrip_frames_and_delays():
    import numpy as np

    from commerce_sessionization_spark.functions.codecs import (
        encode_gif,
        parse_gif_frames,
    )

    frames = [
        np.full((4, 6), 10, np.uint8),
        np.full((4, 6), 20, np.uint8),
        np.full((4, 6), 30, np.uint8),
    ]
    payload = encode_gif(frames, delay_cs=12)
    parsed = parse_gif_frames(payload)
    assert [f["frame_idx"] for f in parsed] == [0, 1, 2]
    assert all(f["width"] == 6 and f["height"] == 4 for f in parsed)
    assert all(f["delay_cs"] == 12 for f in parsed)
    # distinct pixel content -> distinct frame fingerprints
    assert len({f["data_sha256"] for f in parsed}) == 3
    # identical content -> identical fingerprint (deterministic)
    again = parse_gif_frames(encode_gif(frames, delay_cs=12))
    assert [f["data_sha256"] for f in again] == [f["data_sha256"] for f in parsed]


def test_gif_rejects_non_gif():
    import pytest as _pytest

    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
        parse_gif_frames,
    )

    with _pytest.raises(UnsupportedMediaError):
        parse_gif_frames(b"RIFF....WAVE")
    with _pytest.raises(UnsupportedMediaError):
        parse_gif_frames(b"GIF89a")  # truncated


class TestPng:
    """Stdlib-zlib PNG codec: filters, color types, dispatch, rejection."""

    def _roundtrip(self, img, filter_type):
        from commerce_sessionization_spark.functions.codecs import (
            decode_png,
            encode_png,
        )

        decoded, _ = decode_png(encode_png(img, filter_type=filter_type))
        expect = img if img.ndim == 3 and img.shape[2] == 3 else None
        if expect is None:
            if img.ndim == 2:  # gray replicates to RGB
                expect = np.repeat(img[:, :, None], 3, axis=2)
            else:  # RGBA drops alpha
                expect = img[:, :, :3]
        np.testing.assert_array_equal(decoded, expect)

    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_rgb_round_trip_every_filter(self, filter_type):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
        self._roundtrip(img, filter_type)

    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_gray_and_rgba_round_trip(self, filter_type):
        rng = np.random.default_rng(11)
        self._roundtrip(rng.integers(0, 256, size=(9, 13), dtype=np.uint8), filter_type)
        self._roundtrip(
            rng.integers(0, 256, size=(9, 13, 4), dtype=np.uint8), filter_type
        )

    def test_channel_counts_reported(self):
        from commerce_sessionization_spark.functions.codecs import (
            decode_png,
            encode_png,
        )

        gray = np.full((4, 4), 9, dtype=np.uint8)
        assert decode_png(encode_png(gray))[1] == 1
        rgba = np.zeros((4, 4, 4), dtype=np.uint8)
        assert decode_png(encode_png(rgba))[1] == 4
        assert decode_png(encode_png(gradient_rgb()))[1] == 3

    def test_palette_png(self):
        """Hand-built color-type-3 file: index plane + PLTE expansion."""
        import struct
        import zlib

        from commerce_sessionization_spark.functions.codecs import (
            _png_chunk,
            decode_png,
        )

        idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
        palette = np.array(
            [[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
        )
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        body = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", palette.tobytes())
            + _png_chunk(b"IDAT", zlib.compress(body))
            + _png_chunk(b"IEND", b"")
        )
        rgb, n_channels = decode_png(payload)
        assert n_channels == 3
        np.testing.assert_array_equal(rgb, palette[idx])

    def test_features_match_bmp_features(self):
        """Same pixels through PNG and BMP → identical luma + phash."""
        from commerce_sessionization_spark.functions.codecs import (
            encode_png,
            png_features,
        )

        img = gradient_rgb()
        p = png_features(3, encode_png(img))
        b = bmp_features(3, encode_bmp(img))
        assert p["mean_luma"] == b["mean_luma"]
        assert p["phash"] == b["phash"]
        assert (p["width"], p["height"]) == (b["width"], b["height"])

    def test_image_dispatch(self):
        from commerce_sessionization_spark.functions.codecs import (
            encode_png,
            image_features,
        )

        img = gradient_rgb()
        assert image_features(1, encode_png(img))["width"] == img.shape[1]
        assert image_features(1, encode_bmp(img))["width"] == img.shape[1]
        with pytest.raises(UnsupportedMediaError):
            image_features(1, b"\xff\xd8\xff\xe0 jpeg soi")

    def test_rejects_interlaced_and_16bit(self):
        import struct
        import zlib

        from commerce_sessionization_spark.functions.codecs import (
            _png_chunk,
            decode_png,
        )

        def mk(bits, interlace):
            ihdr = struct.pack(">IIBBBBB", 2, 2, bits, 0, 0, 0, interlace)
            body = zlib.compress(b"\x00\x01\x02\x00\x03\x04")
            return (
                b"\x89PNG\r\n\x1a\n"
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", body)
                + _png_chunk(b"IEND", b"")
            )

        with pytest.raises(UnsupportedMediaError):
            decode_png(mk(16, 0))
        with pytest.raises(UnsupportedMediaError):
            decode_png(mk(8, 1))
        with pytest.raises(UnsupportedMediaError):
            decode_png(b"not a png at all")
