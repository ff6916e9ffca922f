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

    def test_rejects_bad_depth_and_garbage(self):
        import struct
        import zlib

        from commerce_sessionization_spark.functions.codecs import (
            _png_chunk,
            decode_png,
        )

        def mk(bits, ct, interlace):
            ihdr = struct.pack(">IIBBBBB", 2, 2, bits, ct, 0, 0, interlace)
            body = zlib.compress(b"\x00\x01\x02\x00\x03\x04")
            return (
                b"\x89PNG\r\n\x1a\n"
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", body)
                + _png_chunk(b"IEND", b"")
            )

        with pytest.raises(UnsupportedMediaError):
            decode_png(mk(16, 3, 0))  # 16-bit palette is illegal
        with pytest.raises(UnsupportedMediaError):
            decode_png(mk(4, 2, 0))  # 4-bit RGB is illegal
        with pytest.raises(UnsupportedMediaError):
            decode_png(mk(8, 2, 7))  # unknown interlace method
        with pytest.raises(UnsupportedMediaError):
            decode_png(b"not a png at all")

    def test_16bit_reduces_to_high_byte(self):
        import struct
        import zlib

        from commerce_sessionization_spark.functions.codecs import (
            _png_chunk,
            decode_png,
        )

        # 2x2 16-bit gray: values chosen so high bytes are distinct
        vals = np.array([[0x1234, 0xFF00], [0x0001, 0x8080]], dtype=">u2")
        rows = b"".join(b"\x00" + vals[y].tobytes() for y in range(2))
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(rows))
            + _png_chunk(b"IEND", b"")
        )
        rgb, nch = decode_png(png)
        assert nch == 1
        np.testing.assert_array_equal(
            rgb[:, :, 0], [[0x12, 0xFF], [0x00, 0x80]]
        )

    def test_subbyte_gray_and_palette(self):
        import struct
        import zlib

        from commerce_sessionization_spark.functions.codecs import (
            _png_chunk,
            decode_png,
        )

        # 4x1 1-bit gray, pattern 1010 -> bits 1010_0000 = 0xA0
        ihdr = struct.pack(">IIBBBBB", 4, 1, 1, 0, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\xa0"))
            + _png_chunk(b"IEND", b"")
        )
        rgb, nch = decode_png(png)
        assert nch == 1
        np.testing.assert_array_equal(rgb[0, :, 0], [255, 0, 255, 0])
        # 4x1 2-bit palette: indices 0,1,2,3 -> bits 00011011 = 0x1b
        ihdr = struct.pack(">IIBBBBB", 4, 1, 2, 3, 0, 0, 0)
        plte = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7))
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", plte)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\x1b"))
            + _png_chunk(b"IEND", b"")
        )
        rgb, nch = decode_png(png)
        assert nch == 3
        np.testing.assert_array_equal(
            rgb[0], [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 7, 7)]
        )

    def test_adam7_interlaced_round_trip(self):
        """Hand-built Adam7 file: pack a known 8x8 RGB image into the
        seven passes (each pass its own filtered sub-image) and assert
        the decoder reassembles the original exactly."""
        import struct
        import zlib

        from commerce_sessionization_spark.functions.codecs import (
            _ADAM7,
            _png_chunk,
            decode_png,
        )

        rng = np.random.default_rng(23)
        for h, w in [(8, 8), (9, 13), (3, 5), (1, 1)]:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            raw = bytearray()
            for col0, row0, cstep, rstep in _ADAM7:
                sub = img[row0::rstep, col0::cstep]
                if sub.size == 0:
                    continue
                for y in range(sub.shape[0]):
                    raw += b"\x00" + sub[y].tobytes()  # filter None
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
            png = (
                b"\x89PNG\r\n\x1a\n"
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _png_chunk(b"IEND", b"")
            )
            rgb, nch = decode_png(png)
            assert nch == 3
            np.testing.assert_array_equal(rgb, img)

class TestJpeg:
    """T.81 baseline JPEG: fixture round-trips bound per-pixel error
    (quant=1 is near-lossless, so FDCT/IDCT rounding is the only loss),
    and a REAL libjpeg-produced file pins the standard-Huffman + 4:2:0 +
    chroma-upsample decode path against bytes this repo didn't encode."""

    def test_round_trip_444_near_lossless(self):
        from commerce_sessionization_spark.functions.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        img = gradient_rgb()
        rgb, n_channels = decode_jpeg(encode_jpeg(img, quant=1))
        assert n_channels == 3
        assert rgb.shape == img.shape
        assert np.abs(rgb.astype(int) - img.astype(int)).max() <= 3

    def test_round_trip_noise_and_odd_dims(self):
        from commerce_sessionization_spark.functions.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(7)
        noise = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
        rgb, _ = decode_jpeg(encode_jpeg(noise, quant=1))
        assert rgb.shape == noise.shape  # block padding cropped away
        assert np.abs(rgb.astype(int) - noise.astype(int)).max() <= 3

    def test_round_trip_420_subsampled(self):
        from commerce_sessionization_spark.functions.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        img = gradient_rgb(40, 56)  # smooth ramps: 2x2 chroma mean is tame
        data = encode_jpeg(img, subsample=True)
        rgb, _ = decode_jpeg(data)
        assert rgb.shape == img.shape
        assert np.abs(rgb.astype(int) - img.astype(int)).max() <= 8

    def test_restart_interval_resets_predictors(self):
        from commerce_sessionization_spark.functions.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        img = gradient_rgb(32, 48)
        plain = decode_jpeg(encode_jpeg(img))[0]
        with_rst = decode_jpeg(encode_jpeg(img, restart_interval=2))[0]
        np.testing.assert_array_equal(plain, with_rst)
        both = decode_jpeg(encode_jpeg(img, subsample=True, restart_interval=3))[0]
        assert np.abs(both.astype(int) - img.astype(int)).max() <= 8

    def test_grayscale_single_component(self):
        from commerce_sessionization_spark.functions.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        g = np.linspace(0, 255, 24 * 32, dtype=np.uint8).reshape(24, 32)
        rgb, n_channels = decode_jpeg(encode_jpeg(g))
        assert n_channels == 1
        assert rgb.shape == (24, 32, 3)
        np.testing.assert_array_equal(rgb[:, :, 0], rgb[:, :, 2])
        assert np.abs(rgb[:, :, 0].astype(int) - g.astype(int)).max() <= 2

    # 16×16 Python-logo JPEG from CPython's own test data
    # (Lib/test/imghdrdata/python.jpg, PSF-licensed) — produced by a real
    # libjpeg encoder: standard Annex-K Huffman tables, 4:2:0 sampling,
    # optimized DQT. Decoding it proves the decoder handles files this
    # repo's fixture encoder did not produce.
    _REAL_JPEG_B64 = (
        "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgKCgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkLEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAARCAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQBBAICAwAAAAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAECBQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLUlRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks51+MiU/Iaad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwetf//Z"
    )

    def test_real_libjpeg_file_decodes(self):
        import base64

        from commerce_sessionization_spark.functions.codecs import (
            decode_jpeg,
            image_features,
        )

        data = base64.b64decode(self._REAL_JPEG_B64)
        rgb, n_channels = decode_jpeg(data)
        assert (rgb.shape, n_channels) == ((16, 16, 3), 3)
        # the logo is mid-toned color art: sane pixel statistics
        assert 60 <= float(rgb.mean()) <= 130
        feats = image_features(9, data)  # dispatch recognizes JPEG magic
        assert (feats["width"], feats["height"]) == (16, 16)
        assert feats["n_channels"] == 3

    def test_progressive_and_truncated_raise(self):
        from commerce_sessionization_spark.functions.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        data = bytearray(encode_jpeg(gradient_rgb()))
        sof = data.index(b"\xff\xc0")
        data[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
        with pytest.raises(UnsupportedMediaError):
            decode_jpeg(bytes(data))
        with pytest.raises(UnsupportedMediaError):
            decode_jpeg(b"\xff\xd8\xff\xe0 jpeg soi")
        with pytest.raises(UnsupportedMediaError):
            decode_jpeg(encode_jpeg(gradient_rgb())[:80])  # truncated scan
        with pytest.raises(UnsupportedMediaError):
            decode_jpeg(b"not a jpeg")

    def test_dc_prediction_spans_mcus(self):
        """A constant mid-gray image: every block's DC rides the predictor
        chain (diff 0 after the first block) and must reconstruct flat."""
        from commerce_sessionization_spark.functions.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        img = np.full((24, 40, 3), 200, dtype=np.uint8)
        rgb, _ = decode_jpeg(encode_jpeg(img))
        assert int(rgb.min()) >= 199 and int(rgb.max()) <= 201


def _lzw_compress(indices, min_code):
    """Test-side standard GIF LZW compressor (greedy longest-match, growing
    code width, 12-bit cap with CLEAR on overflow) — exists to prove the
    decoder handles real dictionary growth, which the fixture encoder's
    clear-per-pixel stream never exercises. Width is driven by a
    simulation of the DECODER's table (which lags the encoder's by one
    add), so emitted widths match what the decoder will read at."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = []  # (code, width)
    state = {}

    def reset():
        state["table"] = {(i,): i for i in range(1 << min_code)}
        state["enc_next"] = end + 1
        state["dec_next"] = end + 1
        state["width"] = min_code + 1
        state["first"] = True  # decoder does not add after its first code

    def emit_data(code):
        out.append((code, state["width"]))
        if state["first"]:
            state["first"] = False
        elif state["dec_next"] < 4096:
            state["dec_next"] += 1
            if state["dec_next"] == (1 << state["width"]) and state["width"] < 12:
                state["width"] += 1

    reset()
    out.append((clear, state["width"]))
    cur = ()
    for px in indices:
        cand = cur + (int(px),)
        if cand in state["table"]:
            cur = cand
            continue
        emit_data(state["table"][cur])
        if state["enc_next"] < 4096:
            state["table"][cand] = state["enc_next"]
            state["enc_next"] += 1
        else:  # table full: clear and restart (decoder resets in sync)
            out.append((clear, state["width"]))
            reset()
        cur = (int(px),)
    if cur:
        emit_data(state["table"][cur])
    out.append((end, state["width"]))
    acc = nacc = 0
    data = bytearray()
    for code, w in out:
        acc |= code << nacc
        nacc += w
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)
    return bytes(data)


class TestGifDecode:
    def test_fixture_round_trip_pixels_exact(self):
        from commerce_sessionization_spark.functions.codecs import (
            decode_gif,
            encode_gif,
        )

        frames_in = [
            np.arange(80, dtype=np.uint8).reshape(8, 10) % 120,
            np.full((8, 10), 99, dtype=np.uint8),
        ]
        frames, delays = decode_gif(encode_gif(frames_in, delay_cs=7))
        assert delays == [7, 7]
        for fin, fout in zip(frames_in, frames):
            # fixture palette is grayscale i -> (i, i, i)
            np.testing.assert_array_equal(fout[:, :, 0], fin)
            np.testing.assert_array_equal(fout[:, :, 1], fin)
            np.testing.assert_array_equal(fout[:, :, 2], fin)

    def test_lzw_dictionary_growth_round_trip(self):
        from commerce_sessionization_spark.functions.codecs import _lzw_decode

        rng = np.random.default_rng(3)
        for min_code in (2, 4, 8):
            # repetitive data drives real multi-symbol dictionary entries
            base = rng.integers(0, 1 << min_code, 50).tolist()
            indices = (base * 40)[: 4096 + 777]
            data = _lzw_compress(indices, min_code)
            assert _lzw_decode(data, min_code) == indices

    def _wrap_gif(self, w, h, pal, frames):
        """Hand-assemble a GIF: frames = [(x, y, fw, fh, indices, gce)],
        gce = (disposal, transparent_idx or None)."""
        import struct as st

        size_code = max(1, (len(pal) - 1).bit_length()) - 1
        out = bytearray(b"GIF89a")
        out += st.pack("<HHBBB", w, h, 0x80 | size_code, 0, 0)
        for r, g, b in pal:
            out += bytes((r, g, b))
        out += b"\x00" * (3 * ((2 << size_code) - len(pal)))
        for x, y, fw, fh, idx, (disposal, trans) in frames:
            flags = (disposal << 2) | (0 if trans is None else 1)
            out += bytes((0x21, 0xF9, 0x04, flags, 5, 0, trans or 0, 0))
            out += bytes((0x2C,)) + st.pack("<HHHHB", x, y, fw, fh, 0)
            min_code = max(2, size_code + 1)
            out += bytes((min_code,))
            data = _lzw_compress(idx, min_code)
            for off in range(0, len(data), 255):
                chunk = data[off : off + 255]
                out += bytes((len(chunk),)) + chunk
            out += b"\x00"
        out += b"\x3b"
        return bytes(out)

    def test_transparency_composites_over_previous_frame(self):
        from commerce_sessionization_spark.functions.codecs import decode_gif

        pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
        full = [0] * 16  # 4×4 all red
        # 2×2 patch at (1,1): green except one transparent pixel (idx 2)
        patch = [1, 2, 1, 1]
        gif = self._wrap_gif(
            4, 4, pal,
            [(0, 0, 4, 4, full, (1, None)), (1, 1, 2, 2, patch, (1, 2))],
        )
        frames, _ = decode_gif(gif)
        assert len(frames) == 2
        np.testing.assert_array_equal(frames[0][0, 0], (255, 0, 0))
        f2 = frames[1]
        np.testing.assert_array_equal(f2[1, 1], (0, 255, 0))   # painted
        np.testing.assert_array_equal(f2[1, 2], (255, 0, 0))   # transparent → red shows
        np.testing.assert_array_equal(f2[2, 1], (0, 255, 0))
        np.testing.assert_array_equal(f2[0, 0], (255, 0, 0))   # outside rect

    def test_disposal_restore_background(self):
        from commerce_sessionization_spark.functions.codecs import decode_gif

        pal = [(10, 10, 10), (200, 200, 200)]
        gif = self._wrap_gif(
            2, 2, pal,
            [
                (0, 0, 2, 2, [1, 1, 1, 1], (2, None)),  # dispose→background
                (0, 0, 1, 1, [1], (1, None)),
            ],
        )
        frames, _ = decode_gif(gif)
        # after disposal 2, uncovered pixels return to background (idx 0)
        np.testing.assert_array_equal(frames[1][1, 1], (10, 10, 10))
        np.testing.assert_array_equal(frames[1][0, 0], (200, 200, 200))

    def test_interlaced_rows_deinterleave(self):
        from commerce_sessionization_spark.functions.codecs import decode_gif

        # 1×8 column image, one distinct color per row, interlaced flag on
        pal = [(i * 30, 0, 0) for i in range(8)]
        row_order = [0, 4, 2, 6, 1, 3, 5, 7]  # pass order for h=8
        idx = row_order  # stored in pass order → must come back 0..7
        import struct as st

        out = bytearray(b"GIF89a")
        out += st.pack("<HHBBB", 1, 8, 0x80 | 2, 0, 0)
        for r, g, b in pal:
            out += bytes((r, g, b))
        out += bytes((0x2C,)) + st.pack("<HHHHB", 0, 0, 1, 8, 0x40)
        data = _lzw_compress(idx, 3)
        out += bytes((3, len(data))) + data + b"\x00\x3b"
        frames, _ = decode_gif(bytes(out))
        np.testing.assert_array_equal(
            frames[0][:, 0, 0], np.arange(8) * 30
        )

    def test_rejects_garbage(self):
        from commerce_sessionization_spark.functions.codecs import decode_gif

        with pytest.raises(UnsupportedMediaError):
            decode_gif(b"not a gif")
        with pytest.raises(UnsupportedMediaError):
            decode_gif(b"GIF89a" + b"\x00" * 4)


class TestMfcc:
    def test_shapes_determinism_and_discrimination(self):
        from commerce_sessionization_spark.functions.codecs import (
            encode_wav,
            wav_mfcc,
        )

        sr = 16000
        t = np.arange(sr) / sr
        tone440 = encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), sr)
        tone2k = encode_wav(0.5 * np.sin(2 * np.pi * 2000 * t), sr)
        n1, m1 = wav_mfcc(tone440)
        assert m1.shape == (n1, 13) and n1 == 1 + (sr - 400) // 160
        _, m1b = wav_mfcc(tone440)
        np.testing.assert_array_equal(m1, m1b)  # deterministic
        _, m2 = wav_mfcc(tone2k)
        # different pitch → clearly separated fingerprints
        assert np.linalg.norm(m1.mean(0) - m2.mean(0)) > 1.0

    def test_edge_cases_and_feature_row(self):
        from commerce_sessionization_spark.functions.codecs import (
            encode_wav,
            wav_mfcc_features,
        )

        # silence stays finite (log floor), short clip yields zero frames
        silent = wav_mfcc_features(1, encode_wav(np.zeros(8000), 16000))
        assert silent["n_frames"] > 0
        assert all(np.isfinite(silent["mfcc_mean"]))
        short = wav_mfcc_features(2, encode_wav(np.zeros(100), 16000))
        assert short["n_frames"] == 0
        assert short["mfcc_mean"] == [0.0] * 13

    def test_mel_filterbank_partition_of_spectrum(self):
        from commerce_sessionization_spark.functions.codecs import (
            _mel_filterbank,
        )

        fb = _mel_filterbank(26, 400, 16000)
        assert fb.shape == (26, 201)
        assert float(fb.min()) >= 0.0
        # every filter has support, and interior bins are covered
        assert (fb.sum(axis=1) > 0).all()
        covered = fb.sum(axis=0)
        assert (covered[5:-5] > 0).all()


class TestJpegProgressive:
    """Progressive (SOF2) decode. Exact validation: a test-side
    successive-approximation encoder packages the SAME coefficients the
    baseline encoder produces into DC-first/AC-first (at Al=1) plus
    DC/AC refinement scans — the decoder must reconstruct pixels
    IDENTICAL to the baseline decode of the same image. Real-world
    progressive files (libjpeg scan scripts) are covered separately in
    test_media_source via skipif paths."""

    def _build_progressive_gray(self, img, with_sa):
        import struct as st

        from commerce_sessionization_spark.functions.codecs import (
            _BitWriter,
            _csize,
            _dht_segment,
            _enc_code,
            _plane_blocks,
        )

        h, w = img.shape
        grid = _plane_blocks(img.astype(np.float64), 1)  # (bh, bw, 64) zigzag
        bh, bw, _ = grid.shape
        blocks = grid.reshape(-1, 64)
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + st.pack(">H", 67) + b"\x00" + bytes([1] * 64)
        sof = st.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        out += b"\xff\xc2" + st.pack(">H", 2 + len(sof)) + sof  # SOF2
        out += _dht_segment()

        def sos(ss, se, ah, al):
            body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
            return b"\xff\xda" + st.pack(">H", 2 + len(body)) + body

        al = 1 if with_sa else 0
        # --- scan 1: DC first at Al=al ---
        out += sos(0, 0, 0, al)
        wtr = _BitWriter()
        pred = 0
        for blk in blocks:
            v = int(blk[0]) >> al  # arithmetic shift, like the decoder ORs back
            diff = v - pred
            pred = v
            s = _csize(diff)
            c, ln = _enc_code(s)
            wtr.write(c, ln)
            if s:
                wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        wtr.flush()
        out += wtr.out
        # --- scan 2: AC first 1..63 at Al=al (per-block EOB, no EOBRUN) ---
        out += sos(1, 63, 0, al)
        wtr = _BitWriter()
        for blk in blocks:
            hi = [
                (1 if v > 0 else -1) * (abs(int(v)) >> al) for v in blk
            ]
            last = max((k for k in range(1, 64) if hi[k]), default=0)
            k, run = 1, 0
            while k <= last:
                if hi[k] == 0:
                    run += 1
                else:
                    while run >= 16:
                        c, ln = _enc_code(0xF0)
                        wtr.write(c, ln)
                        run -= 16
                    s = _csize(hi[k])
                    c, ln = _enc_code((run << 4) | s)
                    wtr.write(c, ln)
                    v = hi[k]
                    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                k += 1
            if last < 63:
                c, ln = _enc_code(0x00)  # EOB (run count 1 → this block)
                wtr.write(c, ln)
        wtr.flush()
        out += wtr.out
        if with_sa:
            # --- scan 3: DC refinement Ah=1, Al=0 (raw low bits) ---
            out += sos(0, 0, 1, 0)
            wtr = _BitWriter()
            for blk in blocks:
                wtr.write(int(blk[0]) & 1, 1)
            wtr.flush()
            out += wtr.out
            # --- scan 4: AC refinement Ah=1, Al=0 ---
            out += sos(1, 63, 1, 0)
            wtr = _BitWriter()
            for blk in blocks:
                absv = [abs(int(v)) for v in blk]
                sign = [1 if v >= 0 else -1 for v in blk]
                hist = [a >> 1 for a in absv]  # what prior scans delivered
                newsig = [
                    k for k in range(1, 64) if hist[k] == 0 and absv[k] == 1
                ]
                run, pending = 0, []
                for k in range(1, 64):
                    if hist[k] != 0:
                        pending.append(absv[k] & 1)  # correction bit
                    elif absv[k] == 1:  # newly significant at this level
                        c, ln = _enc_code((run << 4) | 1)
                        wtr.write(c, ln)
                        wtr.write(1 if sign[k] > 0 else 0, 1)
                        for b in pending:
                            wtr.write(b, 1)
                        pending = []
                        run = 0
                    else:
                        run += 1
                        if run == 16:
                            # ZRL must flush at the 16th zero: the
                            # decoder's pass ends there, and correction
                            # bits after it belong to the next segment
                            c, ln = _enc_code(0xF0)
                            wtr.write(c, ln)
                            for b in pending:
                                wtr.write(b, 1)
                            pending = []
                            run = 0
                if run > 0 or pending:
                    c, ln = _enc_code(0x00)  # EOB, count 1
                    wtr.write(c, ln)
                    for b in pending:
                        wtr.write(b, 1)
            wtr.flush()
            out += wtr.out
        out += b"\xff\xd9"
        return bytes(out)

    @pytest.mark.parametrize("with_sa", [False, True])
    @pytest.mark.parametrize("shape", [(16, 16), (17, 23)])
    def test_progressive_equals_baseline_decode(self, with_sa, shape):
        from commerce_sessionization_spark.functions.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quant=1))[0]
        prog_bytes = self._build_progressive_gray(img, with_sa)
        prog, nch = decode_jpeg(prog_bytes)
        assert nch == 1
        np.testing.assert_array_equal(prog, base)

    def test_progressive_smooth_image_sparse_bands(self, ):
        from commerce_sessionization_spark.functions.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        g = np.linspace(0, 255, 24 * 32, dtype=np.uint8).reshape(24, 32)
        base = decode_jpeg(encode_jpeg(g, quant=1))[0]
        for with_sa in (False, True):
            prog = decode_jpeg(self._build_progressive_gray(g, with_sa))[0]
            np.testing.assert_array_equal(prog, base)


REAL_PROGRESSIVE_FILES = [
    # Spark's own mllib test data — full successive approximation,
    # grayscale, libjpeg scan script (DC Al=1 → AC Al=2 → AC refine
    # Ah=2,Al=1 → DC refine → AC refine Ah=1,Al=0)
    "/opt/spark/data/mllib/images/origin/multi-channel/grayscale.jpg",
    # nodejs docs — 3-component progressive with AC successive approx
    "/usr/share/doc/nodejs/full-white-stripe.jpg",
    "/usr/share/doc/nodejs/thin-white-stripe.jpg",
]


@pytest.mark.parametrize("path", REAL_PROGRESSIVE_FILES)
def test_real_progressive_jpegs_decode(path):
    """In-the-wild progressive files (real libjpeg scan scripts with
    successive approximation) decode to sane images. Skipped when the
    host file is absent — the exact-round-trip tests above are the
    self-contained correctness gate."""
    import os

    from commerce_sessionization_spark.functions.codecs import decode_jpeg

    if not os.path.exists(path):
        pytest.skip(f"host fixture {path} not present")
    rgb, _ = decode_jpeg(open(path, "rb").read())
    assert rgb.ndim == 3 and rgb.shape[2] == 3
    # real photos/graphics: nontrivial dynamic range, not noise/garbage
    assert 20.0 <= float(rgb.mean()) <= 252.0
    assert float(rgb.std()) > 5.0
    if "white-stripe" in path:  # mostly-white graphics by construction
        assert float(rgb.mean()) > 200.0


class TestWavWidths:
    """decode_wav beyond 16-bit: 8/24/32-bit int PCM, IEEE float,
    extensible wrapper — hand-built containers, known sample values."""

    def _wav(self, fmt, bits, rate, n_ch, data, ext=False):
        import struct

        if ext:
            # cbSize(2) + validBits(2) + channelMask(4) + GUID(16, whose
            # first two bytes are the wrapped format tag)
            fmt_body = (
                struct.pack("<HHIIHH", 0xFFFE, n_ch, rate, 0, 0, bits)
                + struct.pack("<HHI", 22, bits, 0)
                + struct.pack("<H", fmt)
                + b"\x00" * 14
            )
        else:
            fmt_body = struct.pack("<HHIIHH", fmt, n_ch, rate, 0, 0, bits)
        chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        chunks += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def test_8bit_unsigned(self):
        from commerce_sessionization_spark.functions.codecs import decode_wav

        data = bytes([128, 255, 0, 192])  # 0, ~+1, -1, +0.5
        rate, mono = decode_wav(self._wav(1, 8, 8000, 1, data))
        np.testing.assert_allclose(
            mono, [0.0, 127 / 128, -1.0, 0.5], atol=1e-9
        )

    def test_24bit_signed(self):
        from commerce_sessionization_spark.functions.codecs import decode_wav

        vals = [0, 1 << 22, -(1 << 22), -1]
        data = b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
        )
        rate, mono = decode_wav(self._wav(1, 24, 44100, 1, data))
        assert rate == 44100
        np.testing.assert_allclose(
            mono, [0.0, 0.5, -0.5, -1.0 / (1 << 23)], atol=1e-12
        )

    def test_32bit_int_and_float(self):
        import struct

        from commerce_sessionization_spark.functions.codecs import decode_wav

        ints = struct.pack("<4i", 0, 1 << 30, -(1 << 30), -(1 << 31))
        _, mono = decode_wav(self._wav(1, 32, 16000, 1, ints))
        np.testing.assert_allclose(mono, [0.0, 0.5, -0.5, -1.0])
        floats = struct.pack("<4f", 0.0, 0.25, -0.5, 1.0)
        _, mono = decode_wav(self._wav(3, 32, 16000, 1, floats))
        np.testing.assert_allclose(mono, [0.0, 0.25, -0.5, 1.0], atol=1e-7)

    def test_extensible_wrapper_and_stereo_mean(self):
        import struct

        from commerce_sessionization_spark.functions.codecs import decode_wav

        data = struct.pack("<4h", 16384, -16384, 8192, 8192)  # 2ch x 2
        rate, mono = decode_wav(self._wav(1, 16, 22050, 2, data, ext=True))
        assert rate == 22050
        np.testing.assert_allclose(mono, [0.0, 0.25], atol=1e-9)

    def test_rejects_unknown_format(self):
        from commerce_sessionization_spark.functions.codecs import decode_wav

        with pytest.raises(UnsupportedMediaError):
            decode_wav(self._wav(85, 16, 8000, 1, b"\x00\x00"))  # MP3-in-WAV


class TestResample:
    def test_identity_and_ratios(self):
        from commerce_sessionization_spark.functions.codecs import (
            resample_audio,
        )

        x = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000.0)
        same = resample_audio(x, 8000, 8000)
        np.testing.assert_array_equal(same, x)
        up = resample_audio(x, 8000, 16000)
        assert len(up) == 16000
        # upsampled signal still a 440 Hz tone: check via zero crossings
        zc = np.count_nonzero(np.signbit(up[1:]) != np.signbit(up[:-1]))
        assert abs(zc - 880) <= 2
        down = resample_audio(x, 8000, 4000)
        assert len(down) == 4000
        zc = np.count_nonzero(np.signbit(down[1:]) != np.signbit(down[:-1]))
        assert abs(zc - 880) <= 2

    def test_preserves_mfcc_pitch_fingerprint(self):
        """8 kHz source resampled to 16 kHz fingerprints close to the
        natively-16 kHz recording of the same tone — the reason the
        standardization step exists."""
        from commerce_sessionization_spark.functions.codecs import (
            encode_wav,
            resample_audio,
            wav_mfcc,
        )

        t8 = np.arange(8000) / 8000.0
        t16 = np.arange(16000) / 16000.0
        tone8 = 0.5 * np.sin(2 * np.pi * 440 * t8)
        tone16 = 0.5 * np.sin(2 * np.pi * 440 * t16)
        up = resample_audio(tone8, 8000, 16000)
        _, m_up = wav_mfcc(encode_wav(up, 16000))
        _, m_native = wav_mfcc(encode_wav(tone16, 16000))
        d = np.linalg.norm(m_up.mean(0) - m_native.mean(0))
        # distance to a DIFFERENT pitch is ~44 (see TestMfcc); the same
        # pitch through linear-interp resampling lands well under half
        # that (the residual is interpolation images in the high mels)
        assert d < 20.0
