"""Dependency-free VP8L (lossless WebP) codec for the multimodal path.

Decoder implements the WebP lossless bitstream (RFC 9649 §3, the format
libwebp writes for ``cwebp -lossless`` and for alpha planes): LSB-first
bit reading, canonical prefix codes in both "simple" and
code-length-coded form, the meta-prefix entropy image, the color cache,
LZ77 back-references with the 120-entry 2D distance map, and all four
transforms — predictor (14 modes), cross-color, subtract-green, and
color-indexing with sub-byte packing for palettes of at most 16 colors.
Lossy VP8 payloads (the other WebP flavor) raise
``UnsupportedMediaError`` — entirely different codec (boolean arithmetic
coding + DCT), out of scope like arithmetic JPEG.

``encode_vp8l`` is the fixture-grade encoder the tests (and the fake
media generator) use: literal-only entropy coding with real canonical
prefix codes plus the subtract-green and color-indexing transforms. It
exists so decode can be validated without third-party binaries — same
pattern as the test-side progressive-JPEG repacker. The LZ77 / color
cache / predictor / cross-color decode paths are exercised by
hand-built bitstreams in tests/test_webp.py.

No counterpart in the reference (f-lab-edu/commerce-sessionization has
no media handling); this extends the training-data pipeline surface the
same way codecs.py does.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` workers
(operators/multimodal.py), so throughput scales with cores and the
driver never sees pixel data. The entropy loop is pure Python
(~0.5 MP/s/core) — the price of zero native dependencies; the transform
inverses are numpy except the inherently sequential predictor.
"""

from __future__ import annotations

import struct

import numpy as np

from commerce_sessionization_spark.functions.codecs import (
    UnsupportedMediaError,
    _luma,
    average_hash,
)

# --------------------------------------------------------------------------
# bit I/O (LSB-first within each byte — same direction as GIF's LZW)
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0  # bit position

    def read(self, n: int) -> int:
        d, p = self._d, self._pos
        if (p + n + 7) // 8 > len(d):
            raise UnsupportedMediaError("truncated VP8L bitstream")
        v = 0
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self._pos = p + n
        return v

    def read_bit(self) -> int:
        p = self._pos
        if p >> 3 >= len(self._d):
            raise UnsupportedMediaError("truncated VP8L bitstream")
        self._pos = p + 1
        return (self._d[p >> 3] >> (p & 7)) & 1


class _BitWriter:
    def __init__(self):
        self._buf = bytearray()
        self._bit = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self._bit == 0:
                self._buf.append(0)
            if (value >> i) & 1:
                self._buf[-1] |= 1 << self._bit
            self._bit = (self._bit + 1) & 7

    def bytes(self) -> bytes:
        return bytes(self._buf)


# --------------------------------------------------------------------------
# canonical prefix codes
# --------------------------------------------------------------------------
#
# Code words are canonical (shorter first; ties by symbol index) and are
# read MSB-first — DEFLATE's convention — while the byte stream itself
# fills LSB-first. A code with exactly one used symbol is read with ZERO
# bits (the spec's degenerate case; "simple" codes with one symbol and
# all-uniform length tables both land here).

_MAX_CODE_LEN = 15


class _PrefixCode:
    __slots__ = ("single", "counts", "syms", "max_len")

    def __init__(self, lengths: list[int]):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise UnsupportedMediaError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            return
        self.single = None
        max_len = max(l for l, _ in used)
        if max_len > _MAX_CODE_LEN:
            raise UnsupportedMediaError("prefix code length > 15")
        counts = [0] * (max_len + 1)
        for l, _ in used:
            counts[l] += 1
        # Kraft: the code must be exactly complete
        kraft = sum(c << (max_len - l) for l, c in enumerate(counts) if l)
        if kraft != 1 << max_len:
            raise UnsupportedMediaError("malformed (incomplete) prefix code")
        used.sort()
        self.counts = counts
        self.syms = [s for _, s in used]
        self.max_len = max_len

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        first = 0
        index = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            n = self.counts[l]
            if code - first < n:
                return self.syms[index + code - first]
            index += n
            first = (first + n) << 1
        raise UnsupportedMediaError("invalid prefix code word")


_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code: 1 or 2 symbols listed literally
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits, else 1 bit
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise UnsupportedMediaError("simple-code symbol out of range")
            lengths[sym0] = lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise UnsupportedMediaError("simple-code symbol out of range")
            lengths[sym0] = 1
        return _PrefixCode(lengths)
    # normal: code lengths are themselves prefix-coded (19-symbol code)
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    if br.read_bit():  # an explicit cap on the number of coded lengths
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len != 0:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, fill = 3 + br.read(3), 0
            else:  # 18
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise UnsupportedMediaError("prefix code length overflow")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _PrefixCode(lengths)


# --------------------------------------------------------------------------
# LZ77 distance map
# --------------------------------------------------------------------------
#
# Distance codes 1..120 name near pixels by 2D offset (dx, dy) rather
# than scan distance. The normative table enumerates every pair with
# dy in [0, 7], dx in [-7, 8] (dy > 0 or dx > 0; exactly 120 pairs)
# ordered by squared euclidean distance, ties by dy descending, then
# positive dx before negative — verified below against the table's
# documented head. Codes > 120 are scan distances minus 120.


def _make_distance_map() -> list[tuple[int, int]]:
    pairs = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return pairs


_DIST_MAP = _make_distance_map()
assert _DIST_MAP[:16] == [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
], "distance map generation drifted from the normative table"
assert _DIST_MAP[34:40] == [(0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]
assert len(_DIST_MAP) == 120


def _plane_code_to_distance(width: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DIST_MAP[plane_code - 1]
    return max(1, dy * width + dx)


def _read_lz77_value(br: _BitReader, prefix_code: int) -> int:
    """Shared length/distance value coding: 4 direct codes then
    (2 + lsb) << extra ranges."""
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.read(extra) + 1


# --------------------------------------------------------------------------
# entropy-coded image (spatially-coded ARGB, sub-images included)
# --------------------------------------------------------------------------

_CACHE_MUL = 0x1E35A7BD


def _div_round_up(a: int, b: int) -> int:
    return -(-a // b)


def _decode_entropy_image(
    br: _BitReader, width: int, height: int, top_level: bool
) -> np.ndarray:
    """Decode the entropy-coded pixel stream → (height*width, 4) uint8
    [a, r, g, b]. Sub-images (entropy / predictor / palette) recurse
    here with top_level=False (no meta-prefix)."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise UnsupportedMediaError("bad color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_w = 0
    meta_bits = 0
    n_groups = 1
    if top_level and br.read_bit():
        meta_bits = br.read(3) + 2
        meta_w = _div_round_up(width, 1 << meta_bits)
        meta_h = _div_round_up(height, 1 << meta_bits)
        meta_px = _decode_entropy_image(br, meta_w, meta_h, False)
        # meta code lives in (red << 8) | green
        meta = (
            meta_px[:, 1].astype(np.int32) << 8
        ) | meta_px[:, 2].astype(np.int32)
        n_groups = int(meta.max()) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )

    n = width * height
    out = np.zeros((n, 4), dtype=np.uint8)
    pos = 0
    group = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % width, pos // width
            group = groups[
                int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
            ]
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.read(br)
        if s < 256:
            g = s
            r = r_code.read(br)
            b = b_code.read(br)
            a = a_code.read(br)
            out[pos] = (a, r, g, b)
            if cache_size:
                argb = (a << 24) | (r << 16) | (g << 8) | b
                cache[(_CACHE_MUL * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            pos += 1
        elif s < 280:
            length = _read_lz77_value(br, s - 256)
            dist_prefix = d_code.read(br)
            plane_code = _read_lz77_value(br, dist_prefix)
            dist = _plane_code_to_distance(width, plane_code)
            if dist > pos or pos + length > n:
                raise UnsupportedMediaError("VP8L back-reference out of range")
            for _ in range(length):  # overlap-safe sequential copy
                out[pos] = out[pos - dist]
                if cache_size:
                    a, r, g, b = (int(v) for v in out[pos])
                    argb = (a << 24) | (r << 16) | (g << 8) | b
                    cache[
                        (_CACHE_MUL * argb & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = argb
                pos += 1
        else:
            if not cache_size:
                raise UnsupportedMediaError("cache symbol without color cache")
            argb = cache[s - 280]
            out[pos] = (
                argb >> 24 & 0xFF,
                argb >> 16 & 0xFF,
                argb >> 8 & 0xFF,
                argb & 0xFF,
            )
            pos += 1
    return out


# --------------------------------------------------------------------------
# transforms (inverse — applied in reverse read order)
# --------------------------------------------------------------------------


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _predict(mode: int, l, t, tl, tr) -> np.ndarray:
    """One predictor for one pixel; args are int32[4] (a, r, g, b)."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int32)
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:  # Select: whole-pixel gradient choice
        gap = int(np.abs(l - tl).sum()) - int(np.abs(t - tl).sum())
        return t if gap <= 0 else l
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(l + t - tl, 0, 255)
    if mode == 13:  # ClampAddSubtractHalf (C-truncating halves)
        ave = _avg2(l, t)
        d = ave - tl
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(ave + half, 0, 255)
    raise UnsupportedMediaError(f"bad predictor mode {mode}")


def _inverse_predictor(
    px: np.ndarray, width: int, height: int, bits: int, modes: np.ndarray
) -> np.ndarray:
    """Sequential inverse: each pixel adds its predictor (mod 256) using
    already-reconstructed neighbors. The out-of-image top-right of the
    last column is the CURRENT row's first pixel (the contiguous-buffer
    rule real decoders share)."""
    tiles_w = _div_round_up(width, 1 << bits)
    out = px.astype(np.int32).reshape(height, width, 4)
    for y in range(height):
        for x in range(width):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[(y >> bits) * tiles_w + (x >> bits)])
                tr = out[y, 0] if x == width - 1 else out[y - 1, x + 1]
                pred = _predict(
                    mode, out[y, x - 1], out[y - 1, x], out[y - 1, x - 1], tr
                )
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.reshape(-1, 4).astype(np.uint8)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(int8)t * (int8)c >> 5 with arithmetic shift semantics."""
    prod = t.astype(np.int8).astype(np.int32) * c.astype(np.int8).astype(
        np.int32
    )
    return prod >> 5


def _inverse_color_transform(
    px: np.ndarray, width: int, height: int, bits: int, elems: np.ndarray
) -> np.ndarray:
    """Cross-color inverse: red += f(green), blue += f(green) + f(red').
    Element channels: green_to_red in blue, green_to_blue in green,
    red_to_blue in red (the spec's packing)."""
    tiles_w = _div_round_up(width, 1 << bits)
    a = px[:, 0].copy()
    r = px[:, 1].astype(np.int32)
    g = px[:, 2].astype(np.int32)
    b = px[:, 3].astype(np.int32)
    idx_y = (np.arange(height) >> bits).repeat(width)
    idx_x = np.tile(np.arange(width) >> bits, height)
    tile = idx_y * tiles_w + idx_x
    g2r = elems[tile, 3]  # blue channel of the element pixel
    g2b = elems[tile, 2]  # green channel
    r2b = elems[tile, 1]  # red channel
    r = (r + _ct_delta(g2r, g)) & 0xFF
    b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
    out = np.stack(
        [a, r.astype(np.uint8), g.astype(np.uint8), b.astype(np.uint8)],
        axis=1,
    )
    return out.astype(np.uint8)


def _inverse_subtract_green(px: np.ndarray) -> np.ndarray:
    g = px[:, 2].astype(np.int32)
    px = px.copy()
    px[:, 1] = ((px[:, 1].astype(np.int32) + g) & 0xFF).astype(np.uint8)
    px[:, 3] = ((px[:, 3].astype(np.int32) + g) & 0xFF).astype(np.uint8)
    return px


def _palette_width_bits(size: int) -> int:
    if size <= 2:
        return 3
    if size <= 4:
        return 2
    if size <= 16:
        return 1
    return 0


def _inverse_color_indexing(
    px: np.ndarray, width: int, height: int, palette: np.ndarray
) -> np.ndarray:
    """Expand indices (stored in green, possibly sub-byte packed) through
    the palette; out-of-range indices decode to transparent black per
    spec."""
    wb = _palette_width_bits(len(palette))
    if wb:
        per = 1 << wb  # indices per packed pixel
        ibits = 8 >> wb
        packed_w = _div_round_up(width, per)
        green = px[:, 2].reshape(height, packed_w)
        xs = np.arange(width)
        shifts = (xs % per) * ibits
        idx = (green[:, xs // per] >> shifts[None, :]) & ((1 << ibits) - 1)
        idx = idx.reshape(-1)
    else:
        idx = px[:, 2].astype(np.int64)
    safe = np.minimum(idx, len(palette) - 1)
    out = palette[safe]
    out[idx >= len(palette)] = 0
    return out.astype(np.uint8)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

_TR_PREDICTOR, _TR_COLOR, _TR_SUBTRACT_GREEN, _TR_COLOR_INDEX = 0, 1, 2, 3


def decode_vp8l(data: bytes) -> tuple[np.ndarray, bool]:
    """Decode a VP8L chunk payload → (H×W×4 uint8 RGBA, alpha_hint)."""
    if not data or data[0] != 0x2F:
        raise UnsupportedMediaError("bad VP8L signature")
    br = _BitReader(data[1:])
    width = br.read(14) + 1
    height = br.read(14) + 1
    alpha_hint = bool(br.read_bit())
    if br.read(3) != 0:
        raise UnsupportedMediaError("unknown VP8L version")

    transforms = []  # (type, payload...) in read order
    seen = set()
    xsize = width
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise UnsupportedMediaError("repeated VP8L transform")
        seen.add(ttype)
        if ttype in (_TR_PREDICTOR, _TR_COLOR):
            bits = br.read(3) + 2
            tw = _div_round_up(xsize, 1 << bits)
            th = _div_round_up(height, 1 << bits)
            sub = _decode_entropy_image(br, tw, th, False)
            transforms.append((ttype, bits, sub, xsize))
        elif ttype == _TR_SUBTRACT_GREEN:
            transforms.append((ttype,))
        else:  # color indexing
            psize = br.read(8) + 1
            pal_px = _decode_entropy_image(br, psize, 1, False)
            palette = np.cumsum(
                pal_px.astype(np.int64), axis=0
            ) & 0xFF  # entries are component-wise deltas
            transforms.append((ttype, palette.astype(np.uint8), xsize))
            xsize = _div_round_up(xsize, 1 << _palette_width_bits(psize))

    px = _decode_entropy_image(br, xsize, height, True)

    for t in reversed(transforms):
        if t[0] == _TR_SUBTRACT_GREEN:
            px = _inverse_subtract_green(px)
        elif t[0] == _TR_PREDICTOR:
            _, bits, sub, w = t
            px = _inverse_predictor(px, w, height, bits, sub[:, 2])
        elif t[0] == _TR_COLOR:
            _, bits, sub, w = t
            px = _inverse_color_transform(px, w, height, bits, sub)
        else:
            _, palette, w = t
            px = _inverse_color_indexing(px, w, height, palette)

    rgba = px.reshape(height, -1, 4)[:, :, [1, 2, 3, 0]]  # argb → rgba
    return np.ascontiguousarray(rgba), alpha_hint


def decode_webp(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a lossless WebP → (H×W×3 uint8 RGB, n_channels).

    Walks the RIFF container (plain VP8L or VP8X-wrapped). Alpha is
    dropped after decode like the PNG path; ``n_channels`` is 4 when the
    stream carries alpha, else 3. Lossy "VP8 " payloads raise
    ``UnsupportedMediaError``.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise UnsupportedMediaError("not a WebP (RIFF) payload")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            rgba, alpha_hint = decode_vp8l(chunk)
            has_alpha = alpha_hint and bool((rgba[:, :, 3] != 255).any())
            return (
                np.ascontiguousarray(rgba[:, :, :3]),
                4 if has_alpha else 3,
            )
        if fourcc == b"VP8 ":
            raise UnsupportedMediaError(
                "lossy (VP8) WebP is not supported — only lossless VP8L"
            )
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise UnsupportedMediaError("WebP container has no VP8L chunk")


def webp_features(asset_id: int, payload: bytes) -> dict:
    """IMAGE_FEATURES_SCHEMA row from a real lossless-WebP decode."""
    rgb, n_channels = decode_webp(payload)
    return {
        "asset_id": asset_id,
        "width": rgb.shape[1],
        "height": rgb.shape[0],
        "n_channels": n_channels,
        "mean_luma": round(float(_luma(rgb).mean()), 6),
        "phash": average_hash(rgb),
    }


# --------------------------------------------------------------------------
# fixture-grade encoder (tests + fake media generation)
# --------------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int = _MAX_CODE_LEN) -> dict[int, int]:
    """Code lengths from frequencies (plain Huffman; fixture images are
    far too small to breach the 15-bit limit, asserted anyway)."""
    import heapq

    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depths = {s: 0 for s in freqs}
    counter = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depths[s] += 1
        heapq.heappush(heap, (f1 + f2, counter, s1 + s2))
        counter += 1
    assert max(depths.values()) <= max_len, "fixture image too entropic"
    return depths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical MSB-first assignment."""
    code = 0
    out = {}
    prev_len = 0
    for length, sym in sorted((l, s) for s, l in lengths.items() if l > 0):
        code <<= length - prev_len
        out[sym] = (code, length)
        code += 1
        prev_len = length
    return out


def _complete_clc_lengths(used: list[int]) -> dict[int, int]:
    """A complete (Kraft-exact) code over the used code-length symbols,
    depth ≤ 7 by construction (≤ 19 symbols → depth ≤ 5 + promotions)."""
    k = len(used)
    if k == 1:
        return {used[0]: 0}  # zero-bit degenerate code
    L = max(1, (k - 1).bit_length())
    promoted = (1 << L) - k  # how many symbols fit one level higher
    return {
        s: (L - 1 if i < promoted else L) for i, s in enumerate(sorted(used))
    }


def _write_code_lengths(
    bw: _BitWriter, lengths: list[int]
) -> None:
    """Normal-mode prefix-code serialization: 3-bit clc lengths in the
    spec order, then every symbol's length through the clc (no RLE —
    fixture simplicity over density)."""
    bw.write(0, 1)  # not simple
    used = sorted(set(lengths))
    clc_len = _complete_clc_lengths(used)
    max_order_idx = max(_CLC_ORDER.index(s) for s in used)
    num_clc = max(4, max_order_idx + 1)
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(clc_len.get(_CLC_ORDER[i], 0), 3)
    codes = _canonical_codes(clc_len)
    bw.write(0, 1)  # no max-symbol cap
    for l in lengths:
        code, n = codes.get(l, (0, 0))
        for i in range(n - 1, -1, -1):  # MSB-first emission
            bw.write((code >> i) & 1, 1)


def _write_prefix_code(bw: _BitWriter, freqs: dict[int, int], alphabet: int) -> dict:
    syms = sorted(freqs)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        first_8bit = 1 if syms[0] > 1 else 0
        bw.write(first_8bit, 1)
        bw.write(syms[0], 8 if first_8bit else 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
            return {syms[0]: (0, 1), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    lengths_map = _huffman_lengths(freqs)
    lengths = [lengths_map.get(s, 0) for s in range(alphabet)]
    _write_code_lengths(bw, lengths)
    return _canonical_codes(lengths_map)


def _emit(bw: _BitWriter, codes: dict, sym: int) -> None:
    code, n = codes[sym]
    for i in range(n - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _encode_literal_stream(
    bw: _BitWriter, px: np.ndarray, green_alphabet: int, top_level: bool = False
) -> None:
    """Entropy-code (N, 4) argb pixels as pure literals (no cache, no
    backrefs): the four per-channel prefix codes + an unused distance
    code. Field order matches the decoder: cache bit, then (top level
    only) the meta-prefix bit, then the five codes."""
    bw.write(0, 1)  # no color cache
    if top_level:
        bw.write(0, 1)  # no meta prefix
    a, r, g, b = px[:, 0], px[:, 1], px[:, 2], px[:, 3]

    def freq(vals):
        u, c = np.unique(vals, return_counts=True)
        return {int(s): int(n) for s, n in zip(u, c)}

    g_codes = _write_prefix_code(bw, freq(g), green_alphabet)
    r_codes = _write_prefix_code(bw, freq(r), 256)
    b_codes = _write_prefix_code(bw, freq(b), 256)
    a_codes = _write_prefix_code(bw, freq(a), 256)
    _write_prefix_code(bw, {0: 1}, 40)  # distance: unused single symbol
    for i in range(len(px)):
        _emit(bw, g_codes, int(g[i]))
        _emit(bw, r_codes, int(r[i]))
        _emit(bw, b_codes, int(b[i]))
        _emit(bw, a_codes, int(a[i]))


def encode_vp8l(
    img: np.ndarray,
    *,
    subtract_green: bool = False,
    use_palette: bool = False,
) -> bytes:
    """Encode H×W×3 RGB or H×W×4 RGBA uint8 → lossless WebP bytes.

    Literal-only coding with real canonical prefix codes; optional
    subtract-green and color-indexing (palette) transforms. Bit-exact
    round-trip with ``decode_webp`` is the tested contract.
    """
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("expected H×W×3 or H×W×4 uint8")
    h, w = img.shape[:2]
    if img.shape[2] == 3:
        rgba = np.dstack([img, np.full((h, w), 255, np.uint8)])
    else:
        rgba = img
    argb = rgba[:, :, [3, 0, 1, 2]].reshape(-1, 4).astype(np.uint8)
    has_alpha = bool((rgba[:, :, 3] != 255).any())

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version

    xsize = w
    if subtract_green:
        bw.write(1, 1)
        bw.write(_TR_SUBTRACT_GREEN, 2)
        argb = argb.astype(np.int32)
        argb[:, 1] = (argb[:, 1] - argb[:, 2]) & 0xFF
        argb[:, 3] = (argb[:, 3] - argb[:, 2]) & 0xFF
        argb = argb.astype(np.uint8)
    if use_palette:
        colors, idx = np.unique(
            np.ascontiguousarray(argb).view([("", np.uint8)] * 4),
            return_inverse=True,
        )
        palette = colors.view(np.uint8).reshape(-1, 4)
        if len(palette) > 256:
            raise ValueError("palette transform needs <= 256 colors")
        bw.write(1, 1)
        bw.write(_TR_COLOR_INDEX, 2)
        bw.write(len(palette) - 1, 8)
        deltas = np.diff(
            np.vstack([np.zeros((1, 4), np.int64), palette.astype(np.int64)]),
            axis=0,
        ) & 0xFF
        _encode_literal_stream(bw, deltas.astype(np.uint8), 256 + 24)
        wb = _palette_width_bits(len(palette))
        idx = idx.reshape(h, w).astype(np.uint8)
        if wb:
            per = 1 << wb
            ibits = 8 >> wb
            packed_w = _div_round_up(w, per)
            packed = np.zeros((h, packed_w), np.uint8)
            for off in range(per):
                cols = idx[:, off::per]
                packed[:, : cols.shape[1]] |= cols << (off * ibits)
            green = packed
            xsize = packed_w
        else:
            green = idx
        argb = np.zeros((h * xsize, 4), np.uint8)
        argb[:, 0] = 255
        argb[:, 2] = green.reshape(-1)
    bw.write(0, 1)  # end of transforms

    _encode_literal_stream(bw, argb, 256 + 24, top_level=True)

    stream = b"\x2f" + bw.bytes()
    vp8l = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
