"""Container demux: MP4/ISO-BMFF, MP3, Ogg, and FLAC metadata without codecs.

A 100 TB crawl corpus is mostly media the cluster cannot (and should not)
fully decode on the triage pass. What the pipeline needs *first* is the
container layer: what is this payload, how long does it run, what codec and
resolution, where do the sync samples live — all answerable from the
container structure alone, dependency-free, in microseconds per asset.
This module parses the four container families that dominate crawled
audio/video (ISO base-media aka MP4/M4A/MOV, MPEG audio aka MP3, Ogg
carrying Opus/Vorbis/Theora, and FLAC) down to:

- stream inventory (codec fourcc, width/height, channels, sample rate),
- timing (duration from the container's own clocks, never by decoding),
- the sample index for MP4 (per-sample byte offset + size + sync flag from
  the ``stbl`` tables), which is what lets ``sample_video_frames`` pull
  keyframe payloads out of an MP4 without an H.264 decoder.

Every parser is a reader of public specifications: ISO/IEC 14496-12 (boxes),
ISO/IEC 11172-3 / 13818-3 (MPEG audio frame headers + the de-facto Xing VBR
header), RFC 3533 (Ogg framing, incl. the 0x04C11DB7 page CRC), RFC 7845
(OpusHead), the Vorbis I spec, and the FLAC format spec (STREAMINFO).
Matching fixture *builders* live here too (``build_mp4`` / ``build_mp3`` /
``build_ogg`` / ``build_flac``): this container ships no media encoders, so
tests hand-assemble spec-literal payloads and the parsers must read back
exactly what was written — same validation style as ``functions.webp``.

The reference pipeline (f-lab-edu/commerce-sessionization) has no media
layer at all; this is north-star training-data-pipeline surface layered on
the same binary-column plumbing as ``operators/multimodal.py``. Scale shape:
each parse touches only header bytes of one payload inside an Arrow batch —
embarrassingly parallel, no shuffle, and the resulting metadata table is
thousands of times smaller than the payload column it summarizes.
"""

from __future__ import annotations

import struct

from commerce_sessionization_spark.functions.codecs import UnsupportedMediaError

# ---------------------------------------------------------------------------
# sniffing


def sniff_container(payload: bytes) -> str | None:
    """Best-effort magic-number detection for the formats this repo parses.

    Returns one of ``mp4 avif mp3 ogg flac wav gif png jpeg webp bmp
    tiff`` or None. MP3 is sniffed last (an 0xFFEx sync word is weak
    evidence); an ID3v2 tag is treated as MP3, matching what crawls
    actually contain. AVIF/HEIF share ISO-BMFF framing with MP4 — the
    ftyp major brand decides.
    """
    p = payload or b""
    if len(p) >= 12 and p[4:8] == b"ftyp":
        if p[8:12] in (b"avif", b"avis", b"heic", b"heix", b"mif1", b"msf1"):
            return "avif"
        return "mp4"
    if p[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if p[:4] == b"OggS":
        return "ogg"
    if p[:4] == b"fLaC":
        return "flac"
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return "wav"
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if p[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        return "webp"
    if p[:2] == b"BM":
        return "bmp"
    if p[:3] == b"ID3":
        return "mp3"
    if len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0:
        return "mp3"
    return None


# ---------------------------------------------------------------------------
# MP4 / ISO base media file format (ISO/IEC 14496-12)


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in buf[start:end]."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        btype = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                break
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body += 8
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            break
        yield btype, body, pos + size
        pos += size


def _find_box(buf: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _iter_boxes(buf, start, end):
        if t == btype:
            return b, e
    return None


def _fullbox(buf: bytes, pos: int) -> tuple[int, int]:
    """Return (version, position after the version/flags word)."""
    return buf[pos], pos + 4


def _parse_stts(buf: bytes, b: int, e: int) -> tuple[int, int]:
    """Return (total_samples, total_delta_ticks) from a time-to-sample box."""
    _, p = _fullbox(buf, b)
    (n,) = struct.unpack_from(">I", buf, p)
    p += 4
    samples = ticks = 0
    for _ in range(n):
        cnt, delta = struct.unpack_from(">II", buf, p)
        p += 8
        samples += cnt
        ticks += cnt * delta
    return samples, ticks


def _parse_stsz(buf: bytes, b: int, e: int) -> list[int]:
    _, p = _fullbox(buf, b)
    uniform, count = struct.unpack_from(">II", buf, p)
    p += 8
    if uniform:
        return [uniform] * count
    return list(struct.unpack_from(f">{count}I", buf, p))


def _parse_stsc(buf: bytes, b: int, e: int) -> list[tuple[int, int]]:
    """Return [(first_chunk, samples_per_chunk), ...] (1-based chunks)."""
    _, p = _fullbox(buf, b)
    (n,) = struct.unpack_from(">I", buf, p)
    p += 4
    out = []
    for _ in range(n):
        first, spc, _desc = struct.unpack_from(">III", buf, p)
        p += 12
        out.append((first, spc))
    return out


def _parse_stco(buf: bytes, b: int, e: int, wide: bool) -> list[int]:
    _, p = _fullbox(buf, b)
    (n,) = struct.unpack_from(">I", buf, p)
    p += 4
    fmt = ">%d%s" % (n, "Q" if wide else "I")
    return list(struct.unpack_from(fmt, buf, p))


def _parse_stss(buf: bytes, b: int, e: int) -> list[int]:
    _, p = _fullbox(buf, b)
    (n,) = struct.unpack_from(">I", buf, p)
    p += 4
    return list(struct.unpack_from(f">{n}I", buf, p))


def _parse_track(buf: bytes, b: int, e: int) -> dict | None:
    tkhd = _find_box(buf, b, e, b"tkhd")
    mdia = _find_box(buf, b, e, b"mdia")
    if tkhd is None or mdia is None:
        return None
    ver, p = _fullbox(buf, tkhd[0])
    # v0: creation(4) modification(4) id(4); v1: 8+8+4
    p += 16 if ver else 8
    (track_id,) = struct.unpack_from(">I", buf, p)
    p += 4 + 4  # id + reserved
    p += 8 if ver else 4  # duration (movie timescale; we use mdhd instead)
    p += 8 + 2 + 2 + 2 + 2 + 36  # reserved, layer, alt_group, volume, pad, matrix
    tk_w, tk_h = struct.unpack_from(">II", buf, p)

    mdhd = _find_box(buf, *mdia, b"mdhd")
    hdlr = _find_box(buf, *mdia, b"hdlr")
    if mdhd is None or hdlr is None:
        return None
    ver, p = _fullbox(buf, mdhd[0])
    if ver:
        p += 16
        timescale, duration = struct.unpack_from(">IQ", buf, p)
    else:
        p += 8
        timescale, duration = struct.unpack_from(">II", buf, p)
    handler = buf[hdlr[0] + 8 : hdlr[0] + 12].decode("latin1")

    track = {
        "track_id": track_id,
        "handler": handler,
        "codec": None,
        "width": tk_w >> 16 or None,
        "height": tk_h >> 16 or None,
        "channels": None,
        "sample_rate": None,
        "n_samples": 0,
        "n_keyframes": None,
        "duration_sec": (duration / timescale) if timescale else None,
        "avg_bitrate_kbps": None,
        "_stbl": None,
        "_timescale": timescale,
    }

    minf = _find_box(buf, *mdia, b"minf")
    stbl = _find_box(buf, *minf, b"stbl") if minf else None
    if stbl is None:
        return track
    track["_stbl"] = stbl
    stsd = _find_box(buf, *stbl, b"stsd")
    if stsd:
        _, p = _fullbox(buf, stsd[0])
        (n_entries,) = struct.unpack_from(">I", buf, p)
        p += 4
        if n_entries:
            entry_size = struct.unpack_from(">I", buf, p)[0]
            track["codec"] = buf[p + 4 : p + 8].decode("latin1").strip()
            body = p + 8 + 6 + 2  # box header + reserved(6) + data_ref_index
            if handler == "vide" and p + entry_size <= stsd[1]:
                q = body + 2 + 2 + 12  # pre_defined, reserved, pre_defined[3]
                w, h = struct.unpack_from(">HH", buf, q)
                track["width"], track["height"] = w, h
            elif handler == "soun":
                q = body + 8  # reserved[2]
                ch, _ssz, _pre, _res, rate = struct.unpack_from(">HHHHI", buf, q)
                track["channels"] = ch
                track["sample_rate"] = rate >> 16
    stts = _find_box(buf, *stbl, b"stts")
    if stts:
        n_samples, _ticks = _parse_stts(buf, *stts)
        track["n_samples"] = n_samples
    stss = _find_box(buf, *stbl, b"stss")
    if stss:
        track["n_keyframes"] = len(_parse_stss(buf, *stss))
    elif handler == "vide" and track["n_samples"]:
        track["n_keyframes"] = track["n_samples"]  # no stss => all sync
    stsz = _find_box(buf, *stbl, b"stsz")
    if stsz and track["duration_sec"]:
        total = sum(_parse_stsz(buf, *stsz))
        track["avg_bitrate_kbps"] = round(
            total * 8 / track["duration_sec"] / 1000.0, 3
        )
    return track


def parse_mp4(payload: bytes) -> dict:
    """Parse an ISO base-media (MP4/M4A/MOV) container's structure.

    Returns ``{container, major_brand, duration_sec, n_tracks, tracks}``
    where each track carries handler ('vide'/'soun'), codec fourcc,
    dimensions or channel/rate, sample + keyframe counts, duration and
    average bitrate — everything from ``moov``'s own tables; no codec work.
    """
    buf = bytes(payload or b"")
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise UnsupportedMediaError("not an ISO base-media file (no ftyp)")
    major_brand = buf[8:12].decode("latin1").strip()
    moov = _find_box(buf, 0, len(buf), b"moov")
    if moov is None:
        raise UnsupportedMediaError("mp4: no moov box (streaming-only file?)")
    mvhd = _find_box(buf, *moov, b"mvhd")
    duration_sec = None
    if mvhd:
        ver, p = _fullbox(buf, mvhd[0])
        if ver:
            p += 16
            timescale, duration = struct.unpack_from(">IQ", buf, p)
        else:
            p += 8
            timescale, duration = struct.unpack_from(">II", buf, p)
        if timescale:
            duration_sec = duration / timescale
    tracks = []
    for t, b, e in _iter_boxes(buf, *moov):
        if t == b"trak":
            tr = _parse_track(buf, b, e)
            if tr is not None:
                tracks.append(tr)
    fragmented = _find_box(buf, 0, len(buf), b"moof") is not None
    if fragmented:
        trex = _trex_defaults(buf, moov)
        for tr in tracks:
            if tr["n_samples"] == 0:
                try:
                    frags = mp4_fragment_index(buf, track_id=tr["track_id"])
                except UnsupportedMediaError:
                    continue
                tr["n_samples"] = len(frags)
                if tr["handler"] == "vide":
                    tr["n_keyframes"] = sum(1 for s in frags if s["sync"])
                # empty mvhd/mdhd durations are the norm for live/DASH
                # recordings; estimate from the trex default tick length
                default_dur = trex.get(tr["track_id"], {}).get("duration", 0)
                if not tr["duration_sec"] and default_dur and tr["_timescale"]:
                    tr["duration_sec"] = (
                        len(frags) * default_dur / tr["_timescale"]
                    )
                    if not duration_sec:
                        duration_sec = tr["duration_sec"]
    for tr in tracks:
        tr.pop("_stbl", None)
        tr.pop("_timescale", None)
    return {
        "container": "mp4",
        "major_brand": major_brand,
        "duration_sec": duration_sec,
        "fragmented": fragmented,
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


def mp4_sample_index(payload: bytes, track_id: int | None = None) -> list[dict]:
    """Flatten one track's ``stbl`` into ``[{sample, offset, size, sync}]``.

    This is the map that makes MP4 payloads addressable without decoding:
    chunk offsets (stco/co64) × run-length chunk layout (stsc) × per-sample
    sizes (stsz) locate every sample's bytes; stss marks sync samples.
    Defaults to the first video track, else the first track.
    """
    buf = bytes(payload or b"")
    moov = _find_box(buf, 0, len(buf), b"moov")
    if moov is None:
        raise UnsupportedMediaError("mp4: no moov box")
    chosen = None
    for t, b, e in _iter_boxes(buf, *moov):
        if t != b"trak":
            continue
        tr = _parse_track(buf, b, e)
        if tr is None or tr["_stbl"] is None:
            continue
        if track_id is not None:
            if tr["track_id"] == track_id:
                chosen = tr
                break
        elif chosen is None or (
            tr["handler"] == "vide" and chosen["handler"] != "vide"
        ):
            chosen = tr
    if chosen is None:
        raise UnsupportedMediaError(f"mp4: track {track_id} not found")
    stbl = chosen["_stbl"]
    stsz = _find_box(buf, *stbl, b"stsz")
    stsc = _find_box(buf, *stbl, b"stsc")
    stco = _find_box(buf, *stbl, b"stco")
    co64 = _find_box(buf, *stbl, b"co64")
    if stsz is None or stsc is None or (stco is None and co64 is None):
        raise UnsupportedMediaError("mp4: incomplete sample tables")
    sizes = _parse_stsz(buf, *stsz)
    if not sizes and _find_box(buf, 0, len(buf), b"moof") is not None:
        # fragmented file: stbl is an empty shell; samples live in moof/trun
        return mp4_fragment_index(buf, track_id=chosen["track_id"])
    runs = _parse_stsc(buf, *stsc)
    offsets = (
        _parse_stco(buf, *stco, wide=False)
        if stco
        else _parse_stco(buf, *co64, wide=True)
    )
    stss = _find_box(buf, *stbl, b"stss")
    sync = set(_parse_stss(buf, *stss)) if stss else None

    # expand stsc runs over the chunk list
    per_chunk = []
    for i, (first, spc) in enumerate(runs):
        last = runs[i + 1][0] if i + 1 < len(runs) else len(offsets) + 1
        per_chunk.extend([spc] * (last - first))
    out = []
    sample = 1
    for chunk_idx, chunk_off in enumerate(offsets):
        off = chunk_off
        for _ in range(per_chunk[chunk_idx] if chunk_idx < len(per_chunk) else 0):
            if sample > len(sizes):
                break
            out.append(
                {
                    "sample": sample,
                    "offset": off,
                    "size": sizes[sample - 1],
                    "sync": (sync is None) or (sample in sync),
                }
            )
            off += sizes[sample - 1]
            sample += 1
    return out


# ---------------------------------------------------------------------------
# AVIF / HEIF still images (ISO-BMFF 'meta' item structure, no AV1 decode)


def parse_avif(payload: bytes) -> dict:
    """Read an AVIF/HEIF image's item structure: codec, dimensions, extras.

    AVIF (AV1) and HEIC (HEVC) are ISO-BMFF files whose image lives as an
    *item* under ``meta``: ``pitm`` names the primary item, ``iinf/infe``
    gives each item's type (av01/hvc1/Exif), ``iprp/ipco`` holds the
    property boxes (``ispe`` = spatial extents), and ``ipma`` associates
    items with properties. This walks exactly those tables — the payload
    (AV1/HEVC bitstream) is never touched, which is the point: a crawl
    pipeline gets dimensions, codec, and an EXIF/alpha flag for free.
    """
    buf = bytes(payload or b"")
    if sniff_container(buf) != "avif":
        raise UnsupportedMediaError("not an AVIF/HEIF payload")
    brand = buf[8:12].decode("latin1")
    meta = _find_box(buf, 0, len(buf), b"meta")
    if meta is None:
        raise UnsupportedMediaError("avif: no meta box")
    # meta is a FullBox: children start after the version/flags word
    mb, me = meta[0] + 4, meta[1]

    primary_id = None
    pitm = _find_box(buf, mb, me, b"pitm")
    if pitm:
        ver, p = _fullbox(buf, pitm[0])
        primary_id = (
            struct.unpack_from(">I", buf, p)[0]
            if ver
            else struct.unpack_from(">H", buf, p)[0]
        )

    item_types: dict[int, str] = {}
    iinf = _find_box(buf, mb, me, b"iinf")
    if iinf:
        ver, p = _fullbox(buf, iinf[0])
        p += 4 if ver else 2
        for t, b, e in _iter_boxes(buf, p, iinf[1]):
            if t != b"infe":
                continue
            iver, q = _fullbox(buf, b)
            if iver >= 3:
                (item_id,) = struct.unpack_from(">I", buf, q)
                q += 4
            else:
                (item_id,) = struct.unpack_from(">H", buf, q)
                q += 2
            q += 2  # item_protection_index
            item_types[item_id] = buf[q : q + 4].decode("latin1")

    # ipco: ordered property list (1-based); ipma: item -> property indices
    props: list[tuple[bytes, int, int]] = []
    assoc: dict[int, list[int]] = {}
    iprp = _find_box(buf, mb, me, b"iprp")
    if iprp:
        ipco = _find_box(buf, *iprp, b"ipco")
        if ipco:
            props = list(_iter_boxes(buf, *ipco))
        ipma = _find_box(buf, *iprp, b"ipma")
        if ipma:
            ver, p = _fullbox(buf, ipma[0])
            flags = int.from_bytes(buf[ipma[0] + 1 : ipma[0] + 4], "big")
            (n,) = struct.unpack_from(">I", buf, p)
            p += 4
            for _ in range(n):
                if ver:
                    (item_id,) = struct.unpack_from(">I", buf, p)
                    p += 4
                else:
                    (item_id,) = struct.unpack_from(">H", buf, p)
                    p += 2
                cnt = buf[p]
                p += 1
                idxs = []
                for _ in range(cnt):
                    if flags & 1:
                        (word,) = struct.unpack_from(">H", buf, p)
                        p += 2
                        idxs.append(word & 0x7FFF)
                    else:
                        idxs.append(buf[p] & 0x7F)
                        p += 1
                assoc[item_id] = idxs

    def ispe_for(item_id: int | None) -> tuple[int | None, int | None]:
        candidates = (
            [props[i - 1] for i in assoc.get(item_id, []) if 0 < i <= len(props)]
            if item_id is not None and assoc
            else props
        )
        for t, b, e in candidates:
            if t == b"ispe":
                w, h = struct.unpack_from(">II", buf, b + 4)
                return w, h
        # fall back to any ispe (some muxers skip ipma for the primary)
        for t, b, e in props:
            if t == b"ispe":
                w, h = struct.unpack_from(">II", buf, b + 4)
                return w, h
        return None, None

    width, height = ispe_for(primary_id)
    codec = item_types.get(primary_id) or next(
        (v for v in item_types.values() if v in ("av01", "hvc1", "hev1")), None
    )
    return {
        "container": "avif",
        "brand": brand,
        "codec": codec,
        "width": width,
        "height": height,
        "n_items": len(item_types),
        "has_exif": "Exif" in item_types.values(),
    }


def build_avif(
    width: int = 640,
    height: int = 480,
    codec: bytes = b"av01",
    brand: bytes = b"avif",
    with_exif: bool = False,
) -> bytes:
    """Assemble a minimal spec-valid AVIF/HEIF 'meta' tree for tests."""
    pitm = _full(b"pitm", 0, 0, struct.pack(">H", 1))
    infes = [
        _full(
            b"infe", 2, 0, struct.pack(">HH", 1, 0) + codec + b"img\x00"
        )
    ]
    if with_exif:
        infes.append(
            _full(b"infe", 2, 0, struct.pack(">HH", 2, 0) + b"Exif" + b"\x00")
        )
    iinf = _full(b"iinf", 0, 0, struct.pack(">H", len(infes)) + b"".join(infes))
    ispe = _full(b"ispe", 0, 0, struct.pack(">II", width, height))
    pixi = _full(b"pixi", 0, 0, bytes([3, 8, 8, 8]))
    ipco = _box(b"ipco", ispe + pixi)
    # associate item 1 -> properties 1 (ispe) and 2 (pixi)
    ipma = _full(
        b"ipma", 0, 0, struct.pack(">I", 1) + struct.pack(">H", 1) + bytes([2, 1, 2])
    )
    iprp = _box(b"iprp", ipco + ipma)
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"pict" + b"\x00" * 12 + b"\x00"
    )
    meta = _full(b"meta", 0, 0, hdlr + pitm + iinf + iprp)
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
    return ftyp + meta + _box(b"mdat", b"\x00" * 16)


# ---------------------------------------------------------------------------
# fragmented MP4 (DASH / CMAF): moof/tfhd/trun sample runs

_TFHD_BASE_DATA_OFFSET = 0x000001
_TFHD_SAMPLE_DESC = 0x000002
_TFHD_DEFAULT_DURATION = 0x000008
_TFHD_DEFAULT_SIZE = 0x000010
_TFHD_DEFAULT_FLAGS = 0x000020
_TFHD_DEFAULT_BASE_IS_MOOF = 0x020000

_TRUN_DATA_OFFSET = 0x000001
_TRUN_FIRST_FLAGS = 0x000004
_TRUN_SAMPLE_DURATION = 0x000100
_TRUN_SAMPLE_SIZE = 0x000200
_TRUN_SAMPLE_FLAGS = 0x000400
_TRUN_SAMPLE_CTS = 0x000800


def _trex_defaults(buf: bytes, moov) -> dict[int, dict]:
    """Per-track defaults from moov/mvex/trex (fragmented files)."""
    out: dict[int, dict] = {}
    mvex = _find_box(buf, *moov, b"mvex")
    if mvex is None:
        return out
    for t, b, e in _iter_boxes(buf, *mvex):
        if t == b"trex":
            _, p = _fullbox(buf, b)
            track_id, _desc, dur, size, flags = struct.unpack_from(">5I", buf, p)
            out[track_id] = {"duration": dur, "size": size, "flags": flags}
    return out


def mp4_fragment_index(payload: bytes, track_id: int | None = None) -> list[dict]:
    """Sample index for a FRAGMENTED MP4 (moof/traf/trun instead of stbl).

    DASH/CMAF segments and live recordings keep ``stbl`` empty and carry
    sample runs in per-fragment ``trun`` boxes; offsets are relative to
    each ``moof`` (default-base-is-moof) or an explicit base offset, and
    sync samples come from per-sample flags (bit 16 of the flags word =
    sample_is_non_sync). Returns the same shape as ``mp4_sample_index``.
    """
    buf = bytes(payload or b"")
    moov = _find_box(buf, 0, len(buf), b"moov")
    defaults = _trex_defaults(buf, moov) if moov else {}
    out: list[dict] = []
    sample_no = 1
    for t, b, e in _iter_boxes(buf, 0, len(buf)):
        if t != b"moof":
            continue
        moof_start = b - 8
        for tt, tb, te in _iter_boxes(buf, b, e):
            if tt != b"traf":
                continue
            tfhd = _find_box(buf, tb, te, b"tfhd")
            if tfhd is None:
                continue
            flags = int.from_bytes(buf[tfhd[0] + 1 : tfhd[0] + 4], "big")
            p = tfhd[0] + 4
            (tid,) = struct.unpack_from(">I", buf, p)
            p += 4
            if track_id is not None and tid != track_id:
                continue
            base = moof_start if flags & _TFHD_DEFAULT_BASE_IS_MOOF else None
            if flags & _TFHD_BASE_DATA_OFFSET:
                (base,) = struct.unpack_from(">Q", buf, p)
                p += 8
            if flags & _TFHD_SAMPLE_DESC:
                p += 4
            if flags & _TFHD_DEFAULT_DURATION:
                p += 4
            default_size = defaults.get(tid, {}).get("size", 0)
            if flags & _TFHD_DEFAULT_SIZE:
                (default_size,) = struct.unpack_from(">I", buf, p)
                p += 4
            default_flags = defaults.get(tid, {}).get("flags", 0)
            if flags & _TFHD_DEFAULT_FLAGS:
                (default_flags,) = struct.unpack_from(">I", buf, p)
                p += 4
            if base is None:
                base = moof_start  # de-facto default in real muxers
            for ut, ub, ue in _iter_boxes(buf, tb, te):
                if ut != b"trun":
                    continue
                tflags = int.from_bytes(buf[ub + 1 : ub + 4], "big")
                q = ub + 4
                (n,) = struct.unpack_from(">I", buf, q)
                q += 4
                offset = base
                if tflags & _TRUN_DATA_OFFSET:
                    (doff,) = struct.unpack_from(">i", buf, q)
                    q += 4
                    offset = base + doff
                first_flags = None
                if tflags & _TRUN_FIRST_FLAGS:
                    (first_flags,) = struct.unpack_from(">I", buf, q)
                    q += 4
                for i in range(n):
                    if tflags & _TRUN_SAMPLE_DURATION:
                        q += 4
                    size = default_size
                    if tflags & _TRUN_SAMPLE_SIZE:
                        (size,) = struct.unpack_from(">I", buf, q)
                        q += 4
                    if tflags & _TRUN_SAMPLE_FLAGS:
                        (sflags,) = struct.unpack_from(">I", buf, q)
                        q += 4
                    elif i == 0 and first_flags is not None:
                        sflags = first_flags
                    else:
                        sflags = default_flags
                    if tflags & _TRUN_SAMPLE_CTS:
                        q += 4
                    out.append(
                        {
                            "sample": sample_no,
                            "offset": offset,
                            "size": size,
                            "sync": not (sflags & 0x00010000),
                        }
                    )
                    offset += size
                    sample_no += 1
    if not out:
        raise UnsupportedMediaError("mp4: no moof fragments found")
    return out


# ---------------------------------------------------------------------------
# MP3 / MPEG audio (ISO/IEC 11172-3, 13818-3) + ID3v2 + Xing

_MP3_BITRATES_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_MP3_BITRATES_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
              "2.5": [11025, 12000, 8000]}


def _mp3_header(word: int) -> dict | None:
    """Decode one 32-bit MPEG audio frame header, or None if invalid."""
    if (word >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (word >> 19) & 3
    layer_bits = (word >> 17) & 3
    if ver_bits == 1 or layer_bits == 0:
        return None
    version = {0: "2.5", 2: "2", 3: "1"}[ver_bits]
    layer = {3: 1, 2: 2, 1: 3}[layer_bits]
    crc = not ((word >> 16) & 1)
    br_idx = (word >> 12) & 0xF
    sr_idx = (word >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    table = _MP3_BITRATES_V1 if version == "1" else _MP3_BITRATES_V2
    bitrate = table[layer][br_idx] * 1000
    rate = _MP3_RATES[version][sr_idx]
    padding = (word >> 9) & 1
    mode = (word >> 6) & 3
    if layer == 1:
        spf = 384
        size = (12 * bitrate // rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == "1") else 576
        size = spf // 8 * bitrate // rate + padding
    return {
        "version": version,
        "layer": layer,
        "crc": crc,
        "bitrate": bitrate,
        "sample_rate": rate,
        "padding": padding,
        "channels": 1 if mode == 3 else 2,
        "mono": mode == 3,
        "samples_per_frame": spf,
        "frame_size": size,
    }


def _id3v2(buf: bytes) -> tuple[dict, int]:
    """Parse a leading ID3v2 tag; return ({text frames}, bytes consumed)."""
    if buf[:3] != b"ID3" or len(buf) < 10:
        return {}, 0
    major = buf[3]
    size = 0
    for byte in buf[6:10]:
        size = (size << 7) | (byte & 0x7F)
    end = 10 + size
    frames: dict[str, str] = {}
    p = 10
    while p + 10 <= min(end, len(buf)):
        fid = buf[p : p + 4]
        if not fid.strip(b"\x00"):
            break
        if major >= 4:  # v2.4: syncsafe frame sizes
            fsize = 0
            for byte in buf[p + 4 : p + 8]:
                fsize = (fsize << 7) | (byte & 0x7F)
        else:
            (fsize,) = struct.unpack_from(">I", buf, p + 4)
        data = buf[p + 10 : p + 10 + fsize]
        if fid.startswith(b"T") and data:
            enc, text = data[0], data[1:]
            try:
                if enc == 1:
                    value = text.decode("utf-16")
                elif enc == 2:
                    value = text.decode("utf-16-be")
                elif enc == 3:
                    value = text.decode("utf-8")
                else:
                    value = text.decode("latin1")
                frames[fid.decode("latin1")] = value.rstrip("\x00")
            except UnicodeDecodeError:
                pass
        p += 10 + fsize
    return frames, end


def parse_mp3(payload: bytes) -> dict:
    """Walk an MPEG-audio stream's frame headers (no audio decode).

    Skips/parses a leading ID3v2 tag, resyncs to the first valid frame
    header, honors a Xing/Info VBR header when present, and otherwise
    counts frames by stepping header-to-header. Duration comes from
    ``frames × samples_per_frame / sample_rate`` — the container's own
    arithmetic, exact for the dominant CBR case and Xing-stamped VBR.
    """
    buf = bytes(payload or b"")
    id3, p0 = _id3v2(buf)
    if not id3 and len(buf) >= 128 and buf[-128:-125] == b"TAG":
        # ID3v1 fallback: fixed-width fields in the trailing 128 bytes,
        # normalized to the v2 frame ids for one uniform tag surface
        t = buf[-128:]

        def field(a: int, b: int) -> str:
            return t[a:b].split(b"\x00")[0].decode("latin1").strip()

        id3 = {
            k: v
            for k, v in (
                ("TIT2", field(3, 33)),
                ("TPE1", field(33, 63)),
                ("TALB", field(63, 93)),
            )
            if v
        }
    # resync: scan for the first parseable header
    first = None
    pos = p0
    while pos + 4 <= len(buf):
        if buf[pos] == 0xFF and (buf[pos + 1] & 0xE0) == 0xE0:
            h = _mp3_header(struct.unpack_from(">I", buf, pos)[0])
            if h is not None and h["frame_size"] >= 4:
                first = h
                break
        pos += 1
    if first is None:
        raise UnsupportedMediaError("mp3: no valid MPEG audio frame header")

    # Xing/Info VBR header sits after the side info of frame 1
    side = (17 if first["mono"] else 32) if first["version"] == "1" else (
        9 if first["mono"] else 17
    )
    xing_at = pos + 4 + (2 if first["crc"] else 0) + side
    n_frames = None
    vbr = False
    if buf[xing_at : xing_at + 4] in (b"Xing", b"Info"):
        vbr = buf[xing_at : xing_at + 4] == b"Xing"
        (flags,) = struct.unpack_from(">I", buf, xing_at + 4)
        if flags & 1:
            (n_frames,) = struct.unpack_from(">I", buf, xing_at + 8)

    bitrates = []
    if n_frames is None:
        # step frame to frame, tolerating a truncated tail
        n_frames = 0
        q = pos
        while q + 4 <= len(buf):
            h = _mp3_header(struct.unpack_from(">I", buf, q)[0])
            if h is None or h["frame_size"] < 4:
                break
            n_frames += 1
            bitrates.append(h["bitrate"])
            q += h["frame_size"]
        vbr = len(set(bitrates)) > 1

    duration = n_frames * first["samples_per_frame"] / first["sample_rate"]
    avg_kbps = (
        round(sum(bitrates) / len(bitrates) / 1000.0, 3)
        if bitrates
        else first["bitrate"] // 1000
    )
    return {
        "container": "mp3",
        "mpeg_version": first["version"],
        "layer": first["layer"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "duration_sec": round(duration, 6),
        "vbr": vbr,
        "bitrate_kbps": avg_kbps,
        "id3": {k: v for k, v in id3.items()},
    }


# ---------------------------------------------------------------------------
# Ogg (RFC 3533) + OpusHead (RFC 7845) / Vorbis I / Theora

_OGG_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _OGG_CRC_TABLE.append(_r & 0xFFFFFFFF)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[((crc >> 24) ^ byte) & 0xFF]
    return crc


def _iter_ogg_pages(buf: bytes, verify_crc: bool = True):
    pos = 0
    while True:
        pos = buf.find(b"OggS", pos)
        if pos < 0 or pos + 27 > len(buf):
            return
        (ver, htype, granule, serial, seq, crc, nsegs) = struct.unpack_from(
            "<BBqIIIB", buf, pos + 4
        )
        lacing = buf[pos + 27 : pos + 27 + nsegs]
        body_start = pos + 27 + nsegs
        body_len = sum(lacing)
        if ver != 0 or len(lacing) < nsegs or body_start + body_len > len(buf):
            pos += 4
            continue
        page = buf[pos : body_start + body_len]
        if verify_crc:
            zeroed = page[:22] + b"\x00\x00\x00\x00" + page[26:]
            if _ogg_crc(zeroed) != crc:
                pos += 4
                continue
        yield {
            "htype": htype,
            "granule": granule,
            "serial": serial,
            "seq": seq,
            "lacing": lacing,
            "body": buf[body_start : body_start + body_len],
        }
        pos = body_start + body_len


def _vorbis_comments(data: bytes) -> dict[str, str]:
    """Decode a Vorbis comment structure (Xiph's shared tag format)."""
    tags: dict[str, str] = {}
    try:
        (vlen,) = struct.unpack_from("<I", data, 0)
        p = 4 + vlen
        (n,) = struct.unpack_from("<I", data, p)
        p += 4
        for _ in range(n):
            (clen,) = struct.unpack_from("<I", data, p)
            p += 4
            item = data[p : p + clen].decode("utf-8", "replace")
            p += clen
            key, sep, val = item.partition("=")
            if sep:
                tags[key.upper()] = val
    except struct.error:
        pass
    return tags


def _ogg_first_packet(page: dict) -> bytes:
    """First packet on a page (possibly truncated if it spans pages)."""
    out = bytearray()
    for lace in page["lacing"]:
        out.extend(page["body"][len(out) : len(out) + lace])
        if lace < 255:
            break
    return bytes(out)


def parse_ogg(payload: bytes) -> dict:
    """Parse Ogg framing + the first stream's identification header.

    Verifies each page's RFC 3533 CRC (corrupt pages are skipped, as a
    resyncing demuxer would), identifies Opus / Vorbis / Theora from the
    BOS packet, and derives duration from the last page's granule position
    using each codec's granule clock (48 kHz for Opus net of pre-skip,
    the declared rate for Vorbis).
    """
    buf = bytes(payload or b"")
    if buf[:4] != b"OggS":
        raise UnsupportedMediaError("ogg: no OggS capture pattern")
    codec = None
    meta: dict = {}
    first_serial = None
    last_granule = None
    n_pages = 0
    for page in _iter_ogg_pages(buf):
        n_pages += 1
        if first_serial is None and page["htype"] & 0x02:  # BOS
            first_serial = page["serial"]
            pkt = _ogg_first_packet(page)
            if pkt.startswith(b"OpusHead") and len(pkt) >= 19:
                codec = "opus"
                meta["channels"] = pkt[9]
                meta["pre_skip"] = struct.unpack_from("<H", pkt, 10)[0]
                meta["input_sample_rate"] = struct.unpack_from("<I", pkt, 12)[0]
                meta["sample_rate"] = 48000  # Opus always decodes at 48 kHz
            elif pkt.startswith(b"\x01vorbis") and len(pkt) >= 30:
                codec = "vorbis"
                meta["channels"] = pkt[11]
                meta["sample_rate"] = struct.unpack_from("<I", pkt, 12)[0]
                meta["bitrate_nominal"] = struct.unpack_from("<i", pkt, 20)[0]
            elif pkt.startswith(b"\x80theora") and len(pkt) >= 26:
                codec = "theora"
                fmbw, fmbh = struct.unpack_from(">HH", pkt, 10)
                picw = int.from_bytes(pkt[14:17], "big")
                pich = int.from_bytes(pkt[17:20], "big")
                meta["width"] = picw or fmbw * 16
                meta["height"] = pich or fmbh * 16
        elif page["serial"] == first_serial and not meta.get("tags"):
            # the header page(s) right after BOS carry the Xiph comment
            # packet: OpusTags, or Vorbis packet type 3
            pkt = _ogg_first_packet(page)
            if pkt.startswith(b"OpusTags"):
                meta["tags"] = _vorbis_comments(pkt[8:])
            elif pkt.startswith(b"\x03vorbis"):
                meta["tags"] = _vorbis_comments(pkt[7:])
        if page["serial"] == first_serial and page["granule"] >= 0:
            last_granule = page["granule"]
    if n_pages == 0:
        raise UnsupportedMediaError("ogg: no valid pages (CRC failures?)")
    duration = None
    if last_granule is not None:
        if codec == "opus":
            duration = max(0, last_granule - meta.get("pre_skip", 0)) / 48000.0
        elif codec == "vorbis" and meta.get("sample_rate"):
            duration = last_granule / meta["sample_rate"]
    return {
        "container": "ogg",
        "codec": codec,
        "n_pages": n_pages,
        "duration_sec": duration,
        **meta,
    }


# ---------------------------------------------------------------------------
# FLAC (STREAMINFO)


def parse_flac(payload: bytes) -> dict:
    """Read FLAC's STREAMINFO (rate/channels/bits/length) + Xiph tags.

    Walks the metadata block chain: STREAMINFO (type 0, mandatory first)
    and VORBIS_COMMENT (type 4 — FLAC reuses the same comment structure
    as Ogg Vorbis/Opus, so ARTIST/TITLE/ALBUM parse identically).
    """
    buf = bytes(payload or b"")
    if buf[:4] != b"fLaC":
        raise UnsupportedMediaError("flac: bad magic")
    info = None
    tags: dict[str, str] = {}
    p = 4
    while p + 4 <= len(buf):
        header = buf[p]
        btype = header & 0x7F
        length = int.from_bytes(buf[p + 1 : p + 4], "big")
        body = buf[p + 4 : p + 4 + length]
        if btype == 0 and length >= 34:
            bits = int.from_bytes(body[10:18], "big")
            sample_rate = bits >> 44
            channels = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            info = {
                "container": "flac",
                "codec": "flac",
                "sample_rate": sample_rate,
                "channels": channels,
                "bits_per_sample": bps,
                "n_samples": total,
                "duration_sec": (total / sample_rate) if sample_rate else None,
                "min_block": struct.unpack_from(">H", body, 0)[0],
                "max_block": struct.unpack_from(">H", body, 2)[0],
            }
        elif btype == 4:
            tags = _vorbis_comments(body)
        if header & 0x80:
            break
        p += 4 + length
    if info is None:
        raise UnsupportedMediaError("flac: no STREAMINFO block")
    info["tags"] = tags
    return info


# ---------------------------------------------------------------------------
# fixture builders (spec-literal writers; no encoder dependencies exist here)


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def build_mp4(
    tracks: list[dict],
    timescale: int = 1000,
    duration_ticks: int = 5000,
    brand: bytes = b"isom",
) -> bytes:
    """Assemble a minimal but spec-valid MP4 for parser tests.

    Each track spec: ``{handler: 'vide'|'soun', codec: 4cc, samples:
    [bytes, ...], keyframes: [1-based sample numbers] | None,
    width/height | channels/sample_rate, sample_delta}``. Samples land in
    one mdat, one chunk per track, and the stbl tables are written to
    match — so ``mp4_sample_index`` can be asserted against the exact
    bytes placed here.
    """
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    mdat_payload = bytearray()
    track_meta = []
    for spec in tracks:
        offset_in_mdat = len(mdat_payload)
        for s in spec["samples"]:
            mdat_payload.extend(s)
        track_meta.append(offset_in_mdat)
    mdat = _box(b"mdat", bytes(mdat_payload))
    mdat_base = len(ftyp) + 8  # data begins after mdat header

    # moov follows mdat; chunk offsets are absolute so this order is fine
    trak_boxes = []
    for idx, spec in enumerate(tracks):
        handler = spec["handler"]
        samples = spec["samples"]
        delta = spec.get("sample_delta", 100)
        tkhd = _full(
            b"tkhd",
            0,
            7,
            struct.pack(">II", 0, 0)
            + struct.pack(">I", spec.get("track_id", idx + 1))
            + struct.pack(">I", 0)
            + struct.pack(">I", len(samples) * delta)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(
                ">II",
                spec.get("width", 0) << 16,
                spec.get("height", 0) << 16,
            ),
        )
        mdhd = _full(
            b"mdhd",
            0,
            0,
            struct.pack(">IIII", 0, 0, timescale, len(samples) * delta)
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _full(
            b"hdlr",
            0,
            0,
            struct.pack(">I", 0)
            + handler.encode()
            + b"\x00" * 12
            + b"demux\x00",
        )
        if handler == "vide":
            entry_body = (
                b"\x00" * 6
                + struct.pack(">H", 1)
                + struct.pack(">HH", 0, 0)
                + struct.pack(">III", 0, 0, 0)
                + struct.pack(">HH", spec.get("width", 0), spec.get("height", 0))
                + struct.pack(">II", 0x480000, 0x480000)
                + struct.pack(">I", 0)
                + struct.pack(">H", 1)
                + b"\x00" * 32
                + struct.pack(">Hh", 24, -1)
            )
        else:
            entry_body = (
                b"\x00" * 6
                + struct.pack(">H", 1)
                + b"\x00" * 8
                + struct.pack(
                    ">HHHHI",
                    spec.get("channels", 2),
                    16,
                    0,
                    0,
                    spec.get("sample_rate", 48000) << 16,
                )
            )
        entry = struct.pack(">I", 8 + len(entry_body)) + spec["codec"] + entry_body
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        stts = _full(
            b"stts", 0, 0, struct.pack(">III", 1, len(samples), delta)
        )
        stsz = _full(
            b"stsz",
            0,
            0,
            struct.pack(">II", 0, len(samples))
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
        stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(samples), 1))
        stco = _full(
            b"stco",
            0,
            0,
            struct.pack(">II", 1, mdat_base + track_meta[idx]),
        )
        stbl_children = [stsd, stts, stsc, stsz, stco]
        if spec.get("keyframes") is not None:
            kf = spec["keyframes"]
            stbl_children.append(
                _full(
                    b"stss",
                    0,
                    0,
                    struct.pack(">I", len(kf))
                    + b"".join(struct.pack(">I", k) for k in kf),
                )
            )
        stbl = _box(b"stbl", b"".join(stbl_children))
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak_boxes.append(_box(b"trak", tkhd + mdia))

    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration_ticks)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", len(tracks) + 1),
    )
    moov = _box(b"moov", mvhd + b"".join(trak_boxes))
    return ftyp + mdat + moov


def build_fmp4(
    fragments: list[list[bytes]],
    sync_first_only: bool = True,
    track_id: int = 1,
    codec: bytes = b"avc1",
    width: int = 320,
    height: int = 240,
    timescale: int = 1000,
) -> bytes:
    """Assemble a fragmented MP4 (DASH-segment shape) for parser tests.

    ``fragments`` is a list of fragments, each a list of sample payloads.
    The moov carries an empty stbl shell + mvex/trex defaults (exactly how
    CMAF init segments look); each fragment is moof(mfhd+traf(tfhd+trun))
    + mdat with default-base-is-moof addressing and per-sample sizes. With
    ``sync_first_only`` each fragment's first sample is a sync sample and
    the rest are marked non-sync via trun per-sample flags.
    """
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">III", 0, 0, track_id)
        + struct.pack(">II", 0, 0)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, 0) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr",
        0,
        0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"demux\x00",
    )
    entry_body = (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + struct.pack(">HH", 0, 0)
        + struct.pack(">III", 0, 0, 0)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(
        b"stsd",
        0,
        0,
        struct.pack(">I", 1)
        + struct.pack(">I", 8 + len(entry_body))
        + codec
        + entry_body,
    )
    empty32 = struct.pack(">I", 0)
    stbl = _box(
        b"stbl",
        stsd
        + _full(b"stts", 0, 0, empty32)
        + _full(b"stsc", 0, 0, empty32)
        + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
        + _full(b"stco", 0, 0, empty32),
    )
    mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
    trak = _box(b"trak", tkhd + mdia)
    trex = _full(
        b"trex", 0, 0, struct.pack(">5I", track_id, 1, 40, 0, 0x00010000)
    )
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, 0)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", track_id + 1),
    )
    moov = _box(b"moov", mvhd + trak + _box(b"mvex", trex))
    out = bytearray(_box(b"ftyp", b"iso5" + struct.pack(">I", 0) + b"cmfc"))
    out += moov
    for seq, samples in enumerate(fragments, start=1):
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        tfhd = _full(
            b"tfhd",
            0,
            _TFHD_DEFAULT_BASE_IS_MOOF,
            struct.pack(">I", track_id),
        )
        # trun: data-offset + per-sample size + per-sample flags
        tflags = _TRUN_DATA_OFFSET | _TRUN_SAMPLE_SIZE | _TRUN_SAMPLE_FLAGS
        rows = b""
        for i, s in enumerate(samples):
            sflags = (
                0x02000000  # depends-on-others clear, sync
                if (i == 0 or not sync_first_only)
                else 0x00010000  # sample_is_non_sync
            )
            rows += struct.pack(">II", len(s), sflags)
        trun_body_len = 4 + 4 + 4 + len(rows)  # ver/flags + count + doff + rows
        # moof = header + mfhd + traf(header + tfhd + trun(header + body))
        moof_len = 8 + len(mfhd) + 8 + len(tfhd) + (8 + trun_body_len)
        doff = moof_len + 8  # into the mdat payload that follows
        trun = _full(
            b"trun",
            0,
            tflags,
            struct.pack(">Ii", len(samples), doff) + rows,
        )
        traf = _box(b"traf", tfhd + trun)
        moof = _box(b"moof", mfhd + traf)
        assert len(moof) == moof_len, (len(moof), moof_len)
        out += moof + _box(b"mdat", b"".join(samples))
    return bytes(out)


def build_mp3(
    n_frames: int = 32,
    bitrate_kbps: int | list[int] = 128,
    sample_rate: int = 44100,
    mono: bool = False,
    id3: dict | None = None,
    xing_frames: int | None = None,
    id3v1: tuple[str, str, str] | None = None,
) -> bytes:
    """Assemble spec-valid MPEG-1 Layer III frames (silent payloads).

    ``id3`` writes a leading ID3v2.4 tag; ``id3v1`` (title, artist, album)
    appends the legacy trailing 128-byte TAG block instead.
    """
    rates = _MP3_RATES["1"]
    sr_idx = rates.index(sample_rate)
    out = bytearray()
    if id3:
        frames = bytearray()
        for fid, text in id3.items():
            data = b"\x03" + text.encode("utf-8")
            frames += fid.encode() + struct.pack(">I", len(data)) + b"\x00\x00" + data
        body = bytes(frames)
        size = len(body)
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + body
    rates_list = (
        bitrate_kbps if isinstance(bitrate_kbps, list) else [bitrate_kbps] * n_frames
    )
    for i in range(n_frames):
        kbps = rates_list[i % len(rates_list)]
        br_idx = _MP3_BITRATES_V1[3].index(kbps)
        word = (
            (0x7FF << 21)
            | (3 << 19)  # MPEG-1
            | (1 << 17)  # Layer III
            | (1 << 16)  # no CRC
            | (br_idx << 12)
            | (sr_idx << 10)
            | ((3 if mono else 0) << 6)
        )
        size = 144 * kbps * 1000 // sample_rate
        frame = bytearray(struct.pack(">I", word)) + b"\x00" * (size - 4)
        if i == 0 and xing_frames is not None:
            side = 17 if mono else 32
            at = 4 + side
            frame[at : at + 12] = b"Xing" + struct.pack(">II", 1, xing_frames)
        out += frame
    if id3v1 is not None:
        title, artist, album = id3v1
        out += (
            b"TAG"
            + title.encode("latin1")[:30].ljust(30, b"\x00")
            + artist.encode("latin1")[:30].ljust(30, b"\x00")
            + album.encode("latin1")[:30].ljust(30, b"\x00")
            + b"2019".ljust(4)
            + b"\x00" * 30
            + b"\xff"
        )
    return bytes(out)


def _ogg_page(
    serial: int, seq: int, granule: int, packets: list[bytes], htype: int = 0
) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for pkt in packets:
        q, r = divmod(len(pkt), 255)
        lacing += b"\xff" * q + bytes([r])
        body += pkt
    header = (
        b"OggS"
        + struct.pack("<BBqIIIB", 0, htype, granule, serial, seq, 0, len(lacing))
        + bytes(lacing)
    )
    page = header + bytes(body)
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def _comment_block(tags: dict[str, str] | None) -> bytes:
    vendor = b"demux-tests"
    items = [f"{k}={v}".encode() for k, v in (tags or {}).items()]
    out = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", len(items))
    for item in items:
        out += struct.pack("<I", len(item)) + item
    return out


def build_ogg_opus(
    duration_sec: float = 2.0,
    channels: int = 2,
    pre_skip: int = 312,
    tags: dict[str, str] | None = None,
) -> bytes:
    """Assemble a CRC-valid Ogg Opus stream (ident + tags + one data page)."""
    head = (
        b"OpusHead"
        + bytes([1, channels])
        + struct.pack("<H", pre_skip)
        + struct.pack("<I", 48000)
        + struct.pack("<h", 0)
        + bytes([0])
    )
    tags_pkt = b"OpusTags" + _comment_block(tags)
    granule = int(duration_sec * 48000) + pre_skip
    return (
        _ogg_page(0x1234, 0, 0, [head], htype=0x02)
        + _ogg_page(0x1234, 1, 0, [tags_pkt])
        + _ogg_page(0x1234, 2, granule, [b"\xfc\xff\xfe"], htype=0x04)
    )


def build_ogg_vorbis(
    duration_sec: float = 2.0,
    sample_rate: int = 44100,
    channels: int = 2,
    tags: dict[str, str] | None = None,
) -> bytes:
    ident = (
        b"\x01vorbis"
        + struct.pack("<I", 0)
        + bytes([channels])
        + struct.pack("<I", sample_rate)
        + struct.pack("<iii", -1, 128000, -1)
        + bytes([0xB8, 0x01])
    )
    comment = b"\x03vorbis" + _comment_block(tags) + b"\x01"
    granule = int(duration_sec * sample_rate)
    return (
        _ogg_page(0x42, 0, 0, [ident], htype=0x02)
        + _ogg_page(0x42, 1, 0, [comment])
        + _ogg_page(0x42, 2, granule, [b"\x00data"], htype=0x04)
    )


def build_flac(
    n_samples: int = 44100 * 3,
    sample_rate: int = 44100,
    channels: int = 2,
    bits_per_sample: int = 16,
    tags: dict[str, str] | None = None,
) -> bytes:
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | n_samples
    )
    streaminfo = (
        struct.pack(">HH", 4096, 4096)
        + (0).to_bytes(3, "big") * 2
        + packed.to_bytes(8, "big")
        + b"\x00" * 16
    )
    blocks = []
    if tags is not None:
        comment = _comment_block(tags)
        blocks.append(bytes([0x04]) + len(comment).to_bytes(3, "big") + comment)
    out = b"fLaC"
    last_flag = 0x00 if blocks else 0x80
    out += bytes([last_flag]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    for i, blk in enumerate(blocks):
        if i == len(blocks) - 1:
            blk = bytes([blk[0] | 0x80]) + blk[1:]
        out += blk
    return out


# ---------------------------------------------------------------------------
# unified triage record


def container_metadata(asset_id: int, payload: bytes) -> dict:
    """One flat triage record for any time-based media payload.

    Dispatches on magic bytes to the right demuxer and flattens the result
    into a fixed schema (unknown fields null). Images are deliberately out
    of scope — ``image_features`` already covers them; this is the
    audio/video triage row. Raises ``UnsupportedMediaError`` only when the
    payload matches no known magic at all.
    """
    kind = sniff_container(payload)
    rec = {
        "asset_id": asset_id,
        "container": kind,
        "codec": None,
        "duration_sec": None,
        "width": None,
        "height": None,
        "sample_rate": None,
        "channels": None,
        "bitrate_kbps": None,
        "n_streams": None,
        "n_samples": None,
        "n_keyframes": None,
        "tags": None,
    }
    if kind == "avif":
        info = parse_avif(payload)
        rec["codec"] = info["codec"]
        rec["width"], rec["height"] = info["width"], info["height"]
        rec["n_streams"] = 1
        rec["n_samples"] = 1
    elif kind == "tiff":
        from commerce_sessionization_spark.functions.metadata import (
            parse_tiff_exif,
        )
        from commerce_sessionization_spark.functions.tiff import (
            tiff_page_count,
        )

        meta = parse_tiff_exif(payload)
        rec["codec"] = "tiff"
        rec["width"], rec["height"] = meta["width"], meta["height"]
        rec["n_streams"] = 1
        rec["n_samples"] = tiff_page_count(payload)  # pages of the scan
    elif kind == "mp4":
        info = parse_mp4(payload)
        rec["duration_sec"] = info["duration_sec"]
        rec["n_streams"] = info["n_tracks"]
        vids = [t for t in info["tracks"] if t["handler"] == "vide"]
        auds = [t for t in info["tracks"] if t["handler"] == "soun"]
        if vids:
            v = vids[0]
            rec["codec"] = v["codec"]
            rec["width"], rec["height"] = v["width"], v["height"]
            rec["n_samples"] = v["n_samples"]
            rec["n_keyframes"] = v["n_keyframes"]
            rec["bitrate_kbps"] = v["avg_bitrate_kbps"]
        if auds:
            a = auds[0]
            rec["sample_rate"] = a["sample_rate"]
            rec["channels"] = a["channels"]
            if not vids:
                rec["codec"] = a["codec"]
                rec["n_samples"] = a["n_samples"]
                rec["bitrate_kbps"] = a["avg_bitrate_kbps"]
    elif kind == "mp3":
        info = parse_mp3(payload)
        rec["codec"] = "mp3"
        rec["duration_sec"] = info["duration_sec"]
        rec["sample_rate"] = info["sample_rate"]
        rec["channels"] = info["channels"]
        rec["bitrate_kbps"] = float(info["bitrate_kbps"])
        rec["n_streams"] = 1
        rec["n_samples"] = info["n_frames"]
        rec["tags"] = info["id3"] or None
    elif kind == "ogg":
        info = parse_ogg(payload)
        rec["codec"] = info["codec"]
        rec["duration_sec"] = info["duration_sec"]
        rec["sample_rate"] = info.get("sample_rate")
        rec["channels"] = info.get("channels")
        rec["width"] = info.get("width")
        rec["height"] = info.get("height")
        rec["n_streams"] = 1
        rec["tags"] = info.get("tags") or None
        if info.get("bitrate_nominal"):
            rec["bitrate_kbps"] = info["bitrate_nominal"] / 1000.0
    elif kind == "flac":
        info = parse_flac(payload)
        rec["codec"] = "flac"
        rec["duration_sec"] = info["duration_sec"]
        rec["sample_rate"] = info["sample_rate"]
        rec["channels"] = info["channels"]
        rec["n_streams"] = 1
        rec["n_samples"] = info["n_samples"]
        rec["tags"] = info.get("tags") or None
    elif kind == "wav":
        from commerce_sessionization_spark.functions.codecs import decode_wav

        rate, samples = decode_wav(payload)
        rec["codec"] = "pcm"
        rec["sample_rate"] = rate
        rec["channels"] = 1
        rec["n_samples"] = len(samples)
        rec["duration_sec"] = len(samples) / rate if rate else None
        rec["n_streams"] = 1
    elif kind == "gif":
        from commerce_sessionization_spark.functions.codecs import parse_gif_frames

        frames = parse_gif_frames(payload)
        rec["codec"] = "gif"
        rec["n_samples"] = len(frames)
        rec["n_keyframes"] = len(frames)
        rec["n_streams"] = 1
        if frames:
            rec["width"] = frames[0].get("width")
            rec["height"] = frames[0].get("height")
            delays = sum(f.get("delay_cs") or 0 for f in frames)
            rec["duration_sec"] = delays / 100.0 if delays else None
    elif kind is None:
        raise UnsupportedMediaError("unrecognized container magic")
    return rec
