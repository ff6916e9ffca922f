"""VP8L (lossless WebP) codec: round-trips through the fixture encoder
plus hand-built bitstreams for the decode-only paths (LZ77 backrefs with
the 2D distance map, color cache, meta-prefix groups, predictor and
cross-color transforms), error contracts, and the Spark media path.

The validation pattern mirrors the progressive-JPEG tests: no
third-party WebP encoder exists in this environment, so decode is held
to (a) bit-exact round-trips against an independently-written forward
path and (b) spec-literal hand-assembled streams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from commerce_sessionization_spark.functions.codecs import (
    UnsupportedMediaError,
    image_features,
)
from commerce_sessionization_spark.functions.webp import (
    _BitWriter,
    _DIST_MAP,
    _ct_delta,
    _encode_literal_stream,
    _predict,
    _write_code_lengths,
    _canonical_codes,
    decode_webp,
    encode_vp8l,
    webp_features,
)


def _rng():
    return np.random.default_rng(20260815)


# ----------------------------------------------------------------------
# round-trips via the fixture encoder
# ----------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape", [(1, 1, 3), (3, 5, 3), (8, 8, 4), (5, 7, 4), (16, 33, 3)]
)
def test_roundtrip_literals(shape):
    img = _rng().integers(0, 256, shape, dtype=np.uint8)
    rgb, nch = decode_webp(encode_vp8l(img))
    assert np.array_equal(rgb, img[:, :, :3])
    assert nch == (4 if shape[2] == 4 and (img[:, :, 3] != 255).any() else 3)


def test_roundtrip_subtract_green():
    img = _rng().integers(0, 256, (9, 13, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_webp(encode_vp8l(img, subtract_green=True))[0], img
    )


@pytest.mark.parametrize("ncol", [2, 3, 4, 9, 16, 40, 256])
def test_roundtrip_palette_widths(ncol):
    """Every sub-byte packing width (3/2/1 bits) plus the unpacked path,
    including non-multiple-of-pack-width image widths."""
    rng = _rng()
    colors = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = colors[rng.integers(0, ncol, (7, 11))]
    assert np.array_equal(decode_webp(encode_vp8l(img, use_palette=True))[0], img)


def test_roundtrip_palette_plus_subtract_green_and_alpha():
    rng = _rng()
    colors = rng.integers(0, 256, (12, 3), dtype=np.uint8)
    img = colors[rng.integers(0, 12, (6, 10))]
    assert np.array_equal(
        decode_webp(encode_vp8l(img, use_palette=True, subtract_green=True))[0],
        img,
    )
    rgba = np.dstack(
        [img, (rng.integers(0, 2, (6, 10)) * 200 + 55).astype(np.uint8)]
    )
    rgb, nch = decode_webp(encode_vp8l(rgba, use_palette=True))
    assert np.array_equal(rgb, img) and nch == 4


# ----------------------------------------------------------------------
# hand-built streams — LZ77, color cache, meta prefix
# ----------------------------------------------------------------------


def _container(bw: _BitWriter) -> bytes:
    stream = b"\x2f" + bw.bytes()
    vp8l = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _write_simple_single(bw: _BitWriter, sym: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    first_8bit = 1 if sym > 1 else 0
    bw.write(first_8bit, 1)
    bw.write(sym, 8 if first_8bit else 1)


def _emit_code(bw: _BitWriter, codes: dict, sym: int) -> None:
    code, n = codes[sym]
    for i in range(n - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def test_lz77_overlapping_run_and_2d_distance():
    """Backref with plane code 2 → offset (1, 0) → scan distance 1: an
    overlapping run (RLE), the copy must be sequential."""
    bw = _BitWriter()
    _header(bw, 4, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    lengths = [0] * 280
    lengths[5], lengths[6], lengths[258] = 1, 2, 2  # 258 = length prefix 2 → 3
    _write_code_lengths(bw, lengths)
    g = _canonical_codes({5: 1, 6: 2, 258: 2})
    _write_simple_single(bw, 7)  # red
    _write_simple_single(bw, 9)  # blue
    _write_simple_single(bw, 255)  # alpha
    _write_simple_single(bw, 1)  # distance: prefix 1 → plane 2 → (1, 0)
    for sym in (5, 6, 258, 5, 5, 6):
        _emit_code(bw, g, sym)
    rgb, _ = decode_webp(_container(bw))
    assert rgb.shape == (2, 4, 3)
    assert rgb[:, :, 1].reshape(-1).tolist() == [5, 6, 6, 6, 6, 5, 5, 6]
    assert (rgb[:, :, 0] == 7).all() and (rgb[:, :, 2] == 9).all()


def test_lz77_row_copy_distance():
    """Plane code 1 → offset (0, 1) → distance = image width: copy the
    whole previous row."""
    bw = _BitWriter()
    _header(bw, 4, 2)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    lengths = [0] * 280
    lengths[3], lengths[4], lengths[259] = 2, 2, 1  # 259 → length 4
    _write_code_lengths(bw, lengths)
    g = _canonical_codes({3: 2, 4: 2, 259: 1})
    _write_simple_single(bw, 0)
    _write_simple_single(bw, 0)
    _write_simple_single(bw, 255)
    _write_simple_single(bw, 0)  # distance prefix 0 → plane 1 → (0, 1)
    for sym in (3, 4, 4, 3, 259):
        _emit_code(bw, g, sym)
    rgb, _ = decode_webp(_container(bw))
    assert rgb[0, :, 1].tolist() == [3, 4, 4, 3]
    assert np.array_equal(rgb[1], rgb[0])


def test_color_cache_hit():
    """Second pixel arrives purely as a cache symbol."""
    a, r, g_lit, b = 255, 1, 200, 2
    argb = (a << 24) | (r << 16) | (g_lit << 8) | b
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 28  # cache_bits = 4
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present
    bw.write(4, 4)  # cache_bits
    bw.write(0, 1)  # no meta
    lengths = [0] * (280 + 16)
    lengths[g_lit] = 1
    lengths[280 + idx] = 1
    _write_code_lengths(bw, lengths)
    g = _canonical_codes({g_lit: 1, 280 + idx: 1})
    _write_simple_single(bw, r)
    _write_simple_single(bw, b)
    _write_simple_single(bw, a)
    _write_simple_single(bw, 0)
    _emit_code(bw, g, g_lit)
    _emit_code(bw, g, 280 + idx)
    rgb, _ = decode_webp(_container(bw))
    assert rgb[0, 0].tolist() == [r, g_lit, b]
    assert np.array_equal(rgb[0, 1], rgb[0, 0])


def test_meta_prefix_groups():
    """Two entropy groups selected by the meta image: left tile decodes
    with group 0's codes, right tile with group 1's."""
    bw = _BitWriter()
    _header(bw, 8, 4)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix present
    bw.write(0, 3)  # meta_bits = 2 → 4×4 tiles → 2×1 meta image
    meta_px = np.array([[255, 0, 0, 0], [255, 0, 1, 0]], dtype=np.uint8)
    _encode_literal_stream(bw, meta_px, 256 + 24)
    for rr, bb in ((10, 20), (30, 40)):  # two groups, all 0-bit codes
        _write_simple_single(bw, 0)  # green literal 0
        _write_simple_single(bw, rr)
        _write_simple_single(bw, bb)
        _write_simple_single(bw, 255)
        _write_simple_single(bw, 0)
    rgb, _ = decode_webp(_container(bw))
    assert (rgb[:, :4] == [10, 0, 20]).all()
    assert (rgb[:, 4:] == [30, 0, 40]).all()


# ----------------------------------------------------------------------
# hand-built streams — predictor and cross-color transforms
# ----------------------------------------------------------------------


def _forward_predictor(img_argb: np.ndarray, bits: int, modes: np.ndarray):
    """Test-side forward pass: residual = pixel − predictor (mod 256),
    scanning with the decoder's border rules (lossless ⇒ the original
    image doubles as the reconstructed neighborhood)."""
    h, w, _ = img_argb.shape
    tiles_w = -(-w // (1 << bits))
    out = img_argb.astype(np.int32)
    res = np.zeros_like(out)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[(y >> bits) * tiles_w + (x >> bits)])
                tr = out[y, 0] if x == w - 1 else out[y - 1, x + 1]
                pred = _predict(
                    mode, out[y, x - 1], out[y - 1, x], out[y - 1, x - 1], tr
                )
            res[y, x] = (out[y, x] - pred) & 0xFF
    return res.astype(np.uint8)


def _predictor_stream(img_rgb: np.ndarray, bits: int, modes: np.ndarray):
    h, w, _ = img_rgb.shape
    argb = np.dstack(
        [np.full((h, w), 255, np.uint8), img_rgb]
    )  # a, r, g, b channel order
    res = _forward_predictor(argb, bits, modes)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # predictor
    bw.write(bits - 2, 3)
    tiles = np.zeros((len(modes), 4), dtype=np.uint8)
    tiles[:, 0] = 255
    tiles[:, 2] = modes  # mode rides the green channel
    _encode_literal_stream(bw, tiles, 256 + 24)
    bw.write(0, 1)  # end of transforms
    _encode_literal_stream(bw, res.reshape(-1, 4), 256 + 24, top_level=True)
    return _container(bw)


@pytest.mark.parametrize("mode", range(14))
def test_predictor_modes_roundtrip(mode):
    img = _rng().integers(0, 256, (9, 7, 3), dtype=np.uint8)
    bits = 2  # 4×4 tiles → 3×2 tile grid
    modes = np.full(6, mode, dtype=np.uint8)
    rgb, _ = decode_webp(_predictor_stream(img, bits, modes))
    assert np.array_equal(rgb, img), f"predictor mode {mode}"


def test_predictor_mixed_tiles():
    rng = _rng()
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    modes = rng.integers(0, 14, 16).astype(np.uint8)  # 4×4 tiles of 4×4
    rgb, _ = decode_webp(_predictor_stream(img, 2, modes))
    assert np.array_equal(rgb, img)


def test_cross_color_transform():
    rng = _rng()
    h, w, bits = 8, 8, 3  # one 8×8 tile
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    g2r, g2b, r2b = 0x10, 0xEA, 0x7F  # mixed-sign int8 multipliers
    r = img[:, :, 0].astype(np.int32)
    g = img[:, :, 1].astype(np.int32)
    b = img[:, :, 2].astype(np.int32)
    coded_r = (r - _ct_delta(np.full_like(r, g2r), g)) & 0xFF
    coded_b = (
        b
        - _ct_delta(np.full_like(b, g2b), g)
        - _ct_delta(np.full_like(b, r2b), r)
    ) & 0xFF
    coded = np.stack(
        [np.full_like(r, 255), coded_r, g, coded_b], axis=2
    ).astype(np.uint8)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # cross-color
    bw.write(bits - 2, 3)
    elem = np.array([[255, r2b, g2b, g2r]], dtype=np.uint8)  # a, r, g, b
    _encode_literal_stream(bw, elem, 256 + 24)
    bw.write(0, 1)
    _encode_literal_stream(bw, coded.reshape(-1, 4), 256 + 24, top_level=True)
    rgb, _ = decode_webp(_container(bw))
    assert np.array_equal(rgb, img)


# ----------------------------------------------------------------------
# distance map, error contracts, dispatch
# ----------------------------------------------------------------------


def test_distance_map_matches_spec_head():
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    # every pair is unique and inside the normative window
    assert len(set(_DIST_MAP)) == 120
    assert all(0 <= dy <= 7 and -7 <= dx <= 8 for dx, dy in _DIST_MAP)


def test_lossy_vp8_raises():
    payload = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(UnsupportedMediaError, match="lossy"):
        decode_webp(payload)


def test_truncated_and_garbage_raise():
    good = encode_vp8l(np.zeros((4, 4, 3), dtype=np.uint8) + 7)
    with pytest.raises(UnsupportedMediaError):
        decode_webp(good[:20])
    with pytest.raises(UnsupportedMediaError):
        decode_webp(b"RIFFxxxxWAVE")
    with pytest.raises(UnsupportedMediaError):
        decode_webp(b"")


def test_image_features_dispatches_webp():
    img = _rng().integers(0, 256, (8, 9, 3), dtype=np.uint8)
    row = image_features(3, encode_vp8l(img))
    assert (row["width"], row["height"], row["n_channels"]) == (9, 8, 3)
    assert row == webp_features(3, encode_vp8l(img))


# ----------------------------------------------------------------------
# Spark media path
# ----------------------------------------------------------------------


def test_media_dir_ingests_webp(spark, tmp_path):
    from commerce_sessionization_spark.operators.multimodal import (
        extract_image_features,
    )
    from commerce_sessionization_spark.sources.io import read_media_dir

    img = _rng().integers(0, 256, (12, 8, 3), dtype=np.uint8)
    (tmp_path / "x.webp").write_bytes(encode_vp8l(img, subtract_green=True))
    media = read_media_dir(spark, str(tmp_path))
    rows = media.collect()
    assert len(rows) == 1 and rows[0]["modality"] == "image"
    assert rows[0]["mime_type"] == "image/webp"
    feats = extract_image_features(media).collect()
    assert len(feats) == 1
    assert (feats[0]["width"], feats[0]["height"]) == (8, 12)
