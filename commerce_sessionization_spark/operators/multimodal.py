"""Multimodal column plumbing: media as opaque binary + typed metadata.

The Spark-side contract — schema (``schemas.MEDIA_SCHEMA``), Arrow-batched
``mapInPandas`` plumbing, partitioning by modality, stable output schemas —
is real and tested, and so is decode for the formats parseable without
codec libraries: **BMP, PNG, JPEG (baseline + progressive), and lossless
WebP (VP8L) images and PCM WAV audio**
run through the real dependency-free decoders in ``functions.codecs`` /
``functions.webp`` (header parse + numpy pixel/sample math; PNG inflates
IDAT with stdlib ``zlib``; JPEG is a full T.81 decode, baseline AND
progressive — Huffman entropy decode, successive approximation,
vectorized IDCT, chroma upsampling; VP8L covers the full lossless
bitstream: prefix codes, LZ77 + color cache, all four transforms).
Formats that need external libs
(arithmetic JPEG, lossy VP8 WebP, AVIF, MP3, video) raise
``NotImplementedError`` on the real path; ``fake=True`` swaps in a
deterministic payload-seeded fake so pipeline shape stays testable for
those modalities too.

At 100 TB: binary payloads dominate row size — always project metadata-only
when features suffice (column pruning keeps payload IO at zero), partition
by ``modality`` so a per-modality pipeline prunes the rest, and size
``maxRecordsPerFile`` low for payload tables.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("phash", StringType()),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)

AUDIO_SPECTRAL_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("dominant_hz", DoubleType()),
        StructField("spectral_centroid_hz", DoubleType()),
        StructField("rolloff85_hz", DoubleType()),
        StructField("zero_crossing_rate", DoubleType()),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_phash", StringType()),
    ]
)


def _fake_image_features(asset_id: int, payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode (no PIL/opencv here)."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "asset_id": asset_id,
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_channels": 3,
        "mean_luma": round(h[2] / 255.0, 6),
        "phash": h.hex()[:16],
    }


def extract_image_features(
    df: DataFrame, fake: bool = False, on_error: str = "raise"
) -> DataFrame:
    """Decode + featurize image payloads via Arrow-batched ``mapInPandas``.

    The real path decodes BMP, PNG, JPEG (baseline + progressive),
    lossless-WebP (VP8L), and baseline TIFF (none/LZW/PackBits strips)
    payloads with the dependency-free parsers in
    ``functions.codecs`` / ``functions.webp`` (width/height/channels,
    Rec.601 mean luma, 8×8 average-hash; PNG rides stdlib ``zlib``,
    JPEG is a full T.81 decode incl. progressive; TIFF implements the
    TIFF-variant LZW with EarlyChange). Other formats raise because
    lossy-VP8 WebP / AVIF need codec libraries this container lacks. ``fake=True`` routes every payload
    to the deterministic fake instead.
    """
    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
        image_features,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                if fake:
                    recs.append(_fake_image_features(a, c))
                    continue
                try:
                    recs.append(image_features(a, bytes(c or b"")))
                except (UnsupportedMediaError, ValueError, struct.error) as e:
                    # skip mode must survive everything the fuzz contract
                    # lets a decoder raise on garbage (ValueError /
                    # struct.error included), not just the triage error —
                    # otherwise one corrupt payload kills the whole pass.
                    if on_error == "skip":
                        continue  # crawl mode: garbage drops, pass lives
                    if not isinstance(e, UnsupportedMediaError):
                        raise
                    raise NotImplementedError(
                        f"asset {a}: only BMP/PNG/JPEG/VP8L/TIFF decode "
                        f"without codec libs ({e}); use fake=True or "
                        "on_error='skip' for other formats"
                    ) from e
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return df.filter(F.col("modality") == "image").select(
        "asset_id", "content"
    ).mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def extract_audio_features(
    df: DataFrame, fake: bool = False, on_error: str = "raise"
) -> DataFrame:
    """Decode + featurize audio payloads via Arrow-batched ``mapInPandas``.

    The real path decodes 16-bit PCM RIFF/WAVE with ``functions.codecs``
    (sample rate, duration, RMS over mono-averaged samples); compressed
    formats (MP3/AAC/OGG) raise ``NotImplementedError``. ``fake=True``
    routes every payload to the deterministic fake instead.
    """
    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
        wav_features,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                if fake:
                    h = hashlib.sha256(c or b"").digest()
                    recs.append(
                        {
                            "asset_id": a,
                            "sample_rate": 16000,
                            "duration_sec": round(len(c or b"") / 32000.0, 6),
                            "rms": round(h[0] / 255.0, 6),
                        }
                    )
                    continue
                try:
                    recs.append(wav_features(a, bytes(c or b"")))
                except (UnsupportedMediaError, ValueError, struct.error) as e:
                    if on_error == "skip":
                        continue  # crawl mode: garbage drops, pass lives
                    if not isinstance(e, UnsupportedMediaError):
                        raise
                    raise NotImplementedError(
                        f"asset {a}: only PCM WAV decodes without codec libs "
                        f"({e}); use fake=True or on_error='skip' for "
                        "other formats"
                    ) from e
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.filter(F.col("modality") == "audio").select(
        "asset_id", "content"
    ).mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )


def extract_audio_spectral(df: DataFrame, fake: bool = False) -> DataFrame:
    """Frequency-domain audio features (FFT) via Arrow-batched
    ``mapInPandas`` — dominant pitch, spectral centroid, 85% rolloff,
    zero-crossing rate per asset.

    The real path runs ONE numpy rfft per PCM-WAV payload inside the
    batch loop (vectorized per asset; Arrow moves only (asset_id,
    content) in and six scalars out). Compressed formats raise
    ``NotImplementedError`` exactly like ``extract_audio_features``;
    ``fake=True`` derives deterministic stand-in values from the
    payload hash so pipelines stay testable without codec libs.
    """
    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
        wav_spectral_features,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                if fake:
                    h = hashlib.sha256(c or b"").digest()
                    recs.append(
                        {
                            "asset_id": a,
                            "sample_rate": 16000,
                            "dominant_hz": float(h[0]) * 8000.0 / 255.0,
                            "spectral_centroid_hz": float(h[1]) * 8000.0 / 255.0,
                            "rolloff85_hz": float(h[2]) * 8000.0 / 255.0,
                            "zero_crossing_rate": float(h[3]) * 2.0,
                        }
                    )
                    continue
                try:
                    recs.append(wav_spectral_features(a, bytes(c or b"")))
                except UnsupportedMediaError as e:
                    raise NotImplementedError(
                        f"asset {a}: only PCM WAV decodes without codec libs "
                        f"({e}); use fake=True for other formats"
                    ) from e
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in AUDIO_SPECTRAL_SCHEMA.fields]
            )

    return df.filter(F.col("modality") == "audio").select(
        "asset_id", "content"
    ).mapInPandas(
        batches, schema=AUDIO_SPECTRAL_SCHEMA
    )


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Frame sampling for motion payloads via Arrow-batched ``mapInPandas``.

    The real path dispatches on the container: animated GIFs walk the
    frame descriptors in ``functions.codecs``; MP4s walk the ``stbl``
    sample tables (``functions.containers.mp4_sample_index``) and emit the
    SYNC samples — the keyframes, exactly the frames a sampling pipeline
    wants, located by byte offset without an H.264 decoder. Either way,
    every ``every_n``-th eligible frame (up to ``max_frames``) is emitted
    with a SHA-256 fingerprint of its compressed bytes. Other video
    containers raise ``NotImplementedError`` (they need ffmpeg bindings
    this container lacks); ``fake=True`` keeps the deterministic stand-in.
    """
    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
        parse_gif_frames,
    )
    from commerce_sessionization_spark.functions.containers import (
        mp4_sample_index,
        sniff_container,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                if fake:
                    n = min(
                        max_frames,
                        1 + (len(c or b"") // max(every_n, 1)) % max_frames,
                    )
                    for i in range(n):
                        recs.append(
                            {
                                "asset_id": a,
                                "frame_idx": i * every_n,
                                "frame_phash": hashlib.sha256(
                                    (c or b"") + i.to_bytes(4, "big")
                                ).hexdigest()[:16],
                            }
                        )
                    continue
                payload = bytes(c or b"")
                if sniff_container(payload) == "mp4":
                    # ftyp sniffs as mp4 but moov may be absent/corrupt:
                    # route those through the same contract as the GIF
                    # branch instead of letting the parse kill the task.
                    try:
                        sync = [
                            s for s in mp4_sample_index(payload) if s["sync"]
                        ]
                    except (
                        UnsupportedMediaError,
                        ValueError,
                        struct.error,
                    ) as e:
                        if on_error == "skip":
                            continue
                        if not isinstance(e, UnsupportedMediaError):
                            raise
                        raise NotImplementedError(
                            f"asset {a}: MP4 container unparsable without "
                            f"ffmpeg fallback ({e}); use fake=True or "
                            "on_error='skip'"
                        ) from e
                    for s in sync[:: max(every_n, 1)][:max_frames]:
                        frame_bytes = payload[
                            s["offset"] : s["offset"] + s["size"]
                        ]
                        recs.append(
                            {
                                "asset_id": a,
                                "frame_idx": s["sample"] - 1,
                                "frame_phash": hashlib.sha256(
                                    frame_bytes
                                ).hexdigest()[:16],
                            }
                        )
                    continue
                try:
                    frames = parse_gif_frames(payload)
                except (UnsupportedMediaError, ValueError, struct.error) as e:
                    if on_error == "skip":
                        continue
                    if not isinstance(e, UnsupportedMediaError):
                        raise
                    raise NotImplementedError(
                        f"asset {a}: only GIF and MP4 containers parse "
                        f"without ffmpeg ({e}); use fake=True or "
                        f"on_error='skip' for other formats"
                    ) from e
                for fr in frames[:: max(every_n, 1)][:max_frames]:
                    recs.append(
                        {
                            "asset_id": a,
                            "frame_idx": fr["frame_idx"],
                            "frame_phash": fr["data_sha256"][:16],
                        }
                    )
            yield pd.DataFrame.from_records(
                recs,
                columns=["asset_id", "frame_idx", "frame_phash"],
            )

    return df.filter(F.col("modality") == "video").select(
        "asset_id", "content"
    ).mapInPandas(
        batches, schema=FRAME_SAMPLE_SCHEMA
    )


AUDIO_MFCC_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("mfcc_mean", ArrayType(DoubleType())),
        StructField("mfcc_std", ArrayType(DoubleType())),
    ]
)


def extract_audio_mfcc(
    df: DataFrame, n_mfcc: int = 13, fake: bool = False
) -> DataFrame:
    """MFCC audio fingerprints via Arrow-batched ``mapInPandas``: the
    standard speech/audio featurization (pre-emphasis → Hamming frames →
    power spectrum → mel filterbank → log → DCT-II) reduced to a
    fixed-size per-asset vector (frame mean + std), computed as one
    numpy matmul chain per payload. The output ``mfcc_mean`` is an
    ``array<double>`` — directly consumable by the embedding similarity
    and dedup operators, so audio near-dup rides the same kNN/SemDeDup
    paths as text embeddings. Compressed audio (MP3/AAC) raises
    ``NotImplementedError``; ``fake=True`` emits a deterministic
    payload-seeded stand-in.
    """
    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
        wav_mfcc_features,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                if fake:
                    h = hashlib.sha256(c or b"").digest()
                    vec = [round(b / 255.0, 6) for b in h[:n_mfcc]]
                    recs.append(
                        {
                            "asset_id": a,
                            "n_frames": 1 + h[0] % 100,
                            "mfcc_mean": vec,
                            "mfcc_std": vec[::-1],
                        }
                    )
                    continue
                try:
                    recs.append(
                        wav_mfcc_features(a, bytes(c or b""), n_mfcc=n_mfcc)
                    )
                except UnsupportedMediaError as e:
                    raise NotImplementedError(
                        f"asset {a}: only PCM WAV decodes without codec "
                        f"libs ({e}); use fake=True for other formats"
                    ) from e
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in AUDIO_MFCC_SCHEMA.fields]
            )

    return df.filter(F.col("modality") == "audio").select(
        "asset_id", "content"
    ).mapInPandas(
        batches, schema=AUDIO_MFCC_SCHEMA
    )


FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("delay_cs", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("phash", StringType()),
    ]
)


def extract_video_frame_features(
    df: DataFrame, every_n: int = 1, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """PIXEL-level frame featurization for motion payloads: full GIF
    decode (real LZW + palette + compositing in ``functions.codecs``),
    then per sampled frame the same luma/phash features the image path
    computes — so cross-modal joins (video frame ↔ image near-dup) use
    one fingerprint space. ``sample_video_frames`` stays the cheap
    container-walk variant (compressed-bytes fingerprints, no pixel
    work); this one pays the decode for real content features. True
    video codecs (H.264/VP9) still raise ``NotImplementedError``.

    At 100 TB: decode cost is per-asset and rides the same Arrow batch;
    sampling (``every_n``, ``max_frames``) bounds output rows, and the
    composited-canvas copies are freed per asset — peak memory is one
    canvas per in-flight row, not per frame.
    """
    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
        _luma,
        average_hash,
        decode_gif,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                if fake:
                    h = hashlib.sha256(c or b"").digest()
                    for i in range(min(max_frames, 1 + h[0] % 4)):
                        recs.append(
                            {
                                "asset_id": a,
                                "frame_idx": i * every_n,
                                "width": 64 + h[1] % 64,
                                "height": 64 + h[2] % 64,
                                "delay_cs": 10,
                                "mean_luma": round(h[3] / 255.0, 6),
                                "phash": h.hex()[:16],
                            }
                        )
                    continue
                try:
                    frames, delays = decode_gif(bytes(c or b""))
                except UnsupportedMediaError as e:
                    raise NotImplementedError(
                        f"asset {a}: only GIF pixels decode without "
                        f"ffmpeg ({e}); use fake=True for other formats"
                    ) from e
                step = max(every_n, 1)
                for i, (rgb, d) in list(enumerate(zip(frames, delays)))[
                    ::step
                ][:max_frames]:
                    recs.append(
                        {
                            "asset_id": a,
                            "frame_idx": i,
                            "width": rgb.shape[1],
                            "height": rgb.shape[0],
                            "delay_cs": d,
                            "mean_luma": round(float(_luma(rgb).mean()), 6),
                            "phash": average_hash(rgb),
                        }
                    )
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in FRAME_FEATURES_SCHEMA.fields]
            )

    return df.filter(F.col("modality") == "video").select(
        "asset_id", "content"
    ).mapInPandas(
        batches, schema=FRAME_FEATURES_SCHEMA
    )


SCENE_CUT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("cut_at_frame", IntegerType()),
        StructField("prev_fingerprint", StringType()),
        StructField("next_fingerprint", StringType()),
    ]
)


def detect_scene_cuts(df: DataFrame, fake: bool = False) -> DataFrame:
    """Scene-change detection for motion payloads: one row per position
    where consecutive frame content fingerprints DIFFER.

    Composes the container walk ``sample_video_frames`` uses (every
    frame, no sampling) with a per-asset adjacent-compare — all inside
    the same Arrow batch, so no second pass over payload bytes and no
    shuffle: the expensive part (container parsing) happens once per
    asset and the cut positions come out directly. Real codecs would
    swap the fingerprint for a frame-difference metric; the GIF path
    uses the compressed-bytes SHA the codec layer already exposes
    (identical frames ⇒ identical bytes in practice for our encoder
    path). ``fake=True`` derives a deterministic stand-in cut list.
    """
    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
        parse_gif_frames,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                if fake:
                    h = hashlib.sha256(c or b"").digest()
                    for i in range(h[0] % 3):
                        recs.append(
                            {
                                "asset_id": a,
                                "cut_at_frame": i + 1,
                                "prev_fingerprint": h[1:9].hex(),
                                "next_fingerprint": h[9:17].hex(),
                            }
                        )
                    continue
                try:
                    frames = parse_gif_frames(bytes(c or b""))
                except UnsupportedMediaError as e:
                    raise NotImplementedError(
                        f"asset {a}: only GIF containers parse without "
                        f"ffmpeg ({e}); use fake=True for other formats"
                    ) from e
                for prev, nxt in zip(frames, frames[1:]):
                    if prev["data_sha256"] != nxt["data_sha256"]:
                        recs.append(
                            {
                                "asset_id": a,
                                "cut_at_frame": nxt["frame_idx"],
                                "prev_fingerprint": prev["data_sha256"][:16],
                                "next_fingerprint": nxt["data_sha256"][:16],
                            }
                        )
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in SCENE_CUT_SCHEMA.fields]
            )

    return df.filter(F.col("modality") == "video").select(
        "asset_id", "content"
    ).mapInPandas(
        batches, schema=SCENE_CUT_SCHEMA
    )


RESAMPLED_AUDIO_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def standardize_audio(
    df: DataFrame, target_rate: int = 16000, fake: bool = False
) -> DataFrame:
    """Normalize audio payloads to mono 16-bit PCM at ``target_rate``
    (linear-interpolation resample) — the audio analog of
    ``resize_images``: every downstream featurizer (MFCC frame sizes,
    spectral bins) then sees one known rate. Accepts any PCM/float WAV
    the codec layer decodes (8/16/24/32-bit int, 32/64-bit float,
    extensible); output ``content`` is a decodable 16-bit WAV, so the
    step composes with ``extract_audio_mfcc``/``extract_audio_spectral``
    downstream. Compressed formats raise ``NotImplementedError``.
    """
    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
        decode_wav,
        encode_wav,
        resample_audio,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                payload = bytes(c or b"")
                if fake:
                    h = hashlib.sha256(payload).digest()
                    n = 100 + h[0]
                    recs.append(
                        {"asset_id": a, "sample_rate": target_rate,
                         "n_samples": n, "content": h * 8}
                    )
                    continue
                try:
                    rate, mono = decode_wav(payload)
                except UnsupportedMediaError as e:
                    raise NotImplementedError(
                        f"asset {a}: only PCM WAV decodes without codec "
                        f"libs ({e}); use fake=True for other formats"
                    ) from e
                out = resample_audio(mono, rate, target_rate)
                recs.append(
                    {
                        "asset_id": a,
                        "sample_rate": target_rate,
                        "n_samples": len(out),
                        "content": encode_wav(out, target_rate),
                    }
                )
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in RESAMPLED_AUDIO_SCHEMA.fields]
            )

    return df.filter(F.col("modality") == "audio").select(
        "asset_id", "content"
    ).mapInPandas(
        batches, schema=RESAMPLED_AUDIO_SCHEMA
    )


def phash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "asset_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs over 64-bit perceptual hashes (the ``phash``
    the image AND video-frame featurizers emit — one fingerprint space,
    so image↔image, frame↔frame, and image↔frame near-dups all come out
    of the same call).

    Scale shape is the SimHash/LSH pattern, not all-pairs: the 16-hex
    phash splits into 4 × 16-bit bands; by pigeonhole, any pair within
    Hamming distance ≤ 3 agrees on at least one whole band, so the
    candidate join is an equi-join on ``(band_idx, band_value)`` and the
    exact Hamming distance (4 × conv/xor/bit_count — all JVM
    expressions, no UDF) verifies only candidates. For ``max_hamming >=
    4`` the band guarantee no longer covers every pair; the operator
    raises rather than silently losing recall.

    Returns (id_l, id_r, hamming), id_l < id_r, deduped across bands.
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            "banded phash join guarantees recall only for max_hamming <= 3 "
            "(4 bands); use more bands or exhaustive compare beyond that"
        )
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.substring(F.col(phash_col), 1 + 4 * i, 4).alias("band_val"),
            )
            for i in range(4)
        ]
    )
    sides = df.select(
        F.col(id_col).alias("_id"),
        F.col(phash_col).alias("_ph"),
        F.explode(bands).alias("_b"),
    ).select("_id", "_ph", "_b.band_idx", "_b.band_val")
    left = sides.alias("l")
    right = sides.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_l"),
            F.col("r._id").alias("id_r"),
            F.col("l._ph").alias("ph_l"),
            F.col("r._ph").alias("ph_r"),
        )
        .distinct()
    )
    hamming = sum(
        F.bit_count(
            F.conv(F.substring("ph_l", 1 + 4 * i, 4), 16, 10).cast("long")
            .bitwiseXOR(
                F.conv(F.substring("ph_r", 1 + 4 * i, 4), 16, 10).cast("long")
            )
        )
        for i in range(4)
    )
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_l", "id_r", "hamming")
    )


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Per-modality rollup over modality + payload size only (no decode)."""
    return df.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.round(F.avg(F.length("content")), 2).alias("avg_bytes"),
    )


#: mime types whose *sample decode* (pixels/PCM) is dependency-free here.
#: Container *metadata* covers far more — see extract_container_metadata.
DECODABLE_IMAGE_MIMES = frozenset(
    {"image/bmp", "image/png", "image/jpeg", "image/webp", "image/tiff"}
)
DECODABLE_AUDIO_MIMES = frozenset({"audio/wav"})
DECODABLE_VIDEO_MIMES = frozenset({"image/gif"})


CONTAINER_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("container", StringType()),
        StructField("codec", StringType()),
        StructField("duration_sec", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bitrate_kbps", DoubleType()),
        StructField("n_streams", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_keyframes", LongType()),
        StructField("tags", MapType(StringType(), StringType())),
    ]
)


def extract_container_metadata(df: DataFrame, fake: bool = False) -> DataFrame:
    """Container-level triage for every media payload — no codec work.

    The step a 100 TB crawl pipeline runs FIRST: demux the container
    structure (``functions.containers``: MP4/ISO-BMFF sample tables, MP3
    frame-header walk + Xing, Ogg pages with RFC 3533 CRC + Opus/Vorbis/
    Theora ident headers, FLAC STREAMINFO, plus WAV/GIF via
    ``functions.codecs``) into one fixed-schema row per asset: container,
    codec, duration, dimensions, rates, stream/sample/keyframe counts.
    Decisions like "sample this video", "skip sub-second clips", "budget
    decode by duration" all read this table — which is thousands of times
    smaller than the payload column — and never touch payload bytes again.

    Best-effort by design: a payload matching no known magic yields a row
    with ``container = 'unknown'`` rather than failing the triage pass
    (crawl data always contains garbage). Runs on ALL modalities.
    """
    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
    )
    from commerce_sessionization_spark.functions.containers import (
        container_metadata,
    )

    cols = [f.name for f in CONTAINER_META_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                if fake:
                    h = hashlib.sha256(c or b"").digest()
                    recs.append(
                        {
                            "asset_id": a,
                            "container": "fake",
                            "codec": "fake",
                            "duration_sec": round(h[0] / 16.0, 6),
                            "sample_rate": 16000,
                            "channels": 1 + h[1] % 2,
                            "n_streams": 1,
                            "tags": None,
                        }
                    )
                    continue
                try:
                    recs.append(container_metadata(a, bytes(c or b"")))
                except (UnsupportedMediaError, ValueError, struct.error):
                    # tags must be an explicit None: pandas fills missing
                    # record keys with NaN, which Arrow's map converter
                    # rejects
                    recs.append(
                        {"asset_id": a, "container": "unknown", "tags": None}
                    )
            yield pd.DataFrame.from_records(recs, columns=cols)

    return df.select("asset_id", "content").mapInPandas(
        batches, schema=CONTAINER_META_SCHEMA
    )


IMAGE_METADATA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("orientation", IntegerType()),
        StructField("make", StringType()),
        StructField("model", StringType()),
        StructField("datetime_original", StringType()),
        StructField("has_gps", BooleanType()),
        StructField("dpi", DoubleType()),
        StructField("software", StringType()),
    ]
)


def extract_image_metadata(df: DataFrame, fake: bool = False) -> DataFrame:
    """Embedded image metadata (EXIF / PNG chunks) — header-prefix parse only.

    The filter columns a vision corpus pipeline needs before any pixel
    work: EXIF orientation (is the stored width/height swapped? does
    ingestion need a rotate?), camera make/model and DateTimeOriginal
    (provenance, recency), a GPS-IFD flag (PII — feed it to the privacy
    scrub), PNG DPI and Software/text chunks (toolchain provenance, and
    where generative-model provenance strings live). JPEG dimensions come
    from the SOF marker and PNG's from IHDR, so no payload is ever
    entropy-decoded; formats without embedded metadata (BMP/WebP/GIF)
    yield a format + null-fields row rather than failing the pass.
    """
    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
    )
    from commerce_sessionization_spark.functions.containers import (
        sniff_container,
    )
    from commerce_sessionization_spark.functions.metadata import (
        jpeg_dimensions,
        parse_jpeg_exif,
        parse_png_metadata,
    )

    cols = [f.name for f in IMAGE_METADATA_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                if fake:
                    h = hashlib.sha256(c or b"").digest()
                    recs.append(
                        {
                            "asset_id": a,
                            "format": "fake",
                            "width": 1 + h[0],
                            "height": 1 + h[1],
                            "orientation": 1,
                            "has_gps": False,
                        }
                    )
                    continue
                payload = bytes(c or b"")
                kind = sniff_container(payload)
                rec = {"asset_id": a, "format": kind or "unknown"}
                try:
                    if kind == "jpeg":
                        exif = parse_jpeg_exif(payload)
                        w, h = jpeg_dimensions(payload)
                        rec.update(
                            width=w,
                            height=h,
                            orientation=exif["orientation"],
                            make=exif["make"],
                            model=exif["model"],
                            datetime_original=exif["datetime_original"]
                            or exif["datetime"],
                            has_gps=exif["has_gps"],
                        )
                    elif kind == "png":
                        m = parse_png_metadata(payload)
                        rec.update(
                            width=m["width"],
                            height=m["height"],
                            dpi=m["dpi"],
                            software=m["text"].get("Software"),
                            datetime_original=m["modified"],
                            has_gps=False,
                        )
                    elif kind == "avif":
                        from commerce_sessionization_spark.functions.containers import (  # noqa: E501
                            parse_avif,
                        )

                        m = parse_avif(payload)
                        rec.update(
                            width=m["width"],
                            height=m["height"],
                            has_gps=False,
                        )
                    elif kind == "tiff":
                        from commerce_sessionization_spark.functions.metadata import (  # noqa: E501
                            parse_tiff_exif,
                        )

                        m = parse_tiff_exif(payload)
                        rec.update(
                            width=m["width"],
                            height=m["height"],
                            orientation=m["orientation"],
                            make=m["make"],
                            model=m["model"],
                            datetime_original=m["datetime_original"]
                            or m["datetime"],
                            has_gps=m["has_gps"],
                        )
                except (UnsupportedMediaError, ValueError, struct.error):
                    pass  # keep the format-only row; triage never fails
                recs.append(rec)
            yield pd.DataFrame.from_records(recs, columns=cols)

    return df.filter(F.col("modality") == "image").select(
        "asset_id", "content"
    ).mapInPandas(
        batches, schema=IMAGE_METADATA_SCHEMA
    )


RESIZED_IMAGE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_images(df: DataFrame, max_dim: int = 64, fake: bool = False) -> DataFrame:
    """Downscale image payloads so the longest edge ≤ ``max_dim`` via
    Arrow-batched ``mapInPandas`` (the thumbnail/normalize step every
    vision-data pipeline runs before feature extraction).

    Real path: BMP/PNG/JPEG decode → nearest-neighbor index
    sampling (pure numpy, no PIL) → re-encode in the SAME container the
    asset arrived in (JPEG re-encodes near-lossless at ``quant=1``);
    images already within bounds pass through byte-identical.
    Other formats raise ``NotImplementedError`` (codec libs);
    ``fake=True`` emits a deterministic payload-seeded stand-in with the
    correctly scaled dimensions so pipeline shape stays testable.

    Output keeps the ``content`` column a decodable image — resize
    composes with ``extract_image_features`` downstream.
    """
    import numpy as np

    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
        decode_bmp,
        decode_jpeg,
        decode_png,
        encode_bmp,
        encode_jpeg,
        encode_png,
    )

    def scaled(w: int, h: int) -> tuple[int, int]:
        m = max(w, h)
        if m <= max_dim:
            return w, h
        return max(1, (w * max_dim) // m), max(1, (h * max_dim) // m)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                payload = bytes(c or b"")
                if fake:
                    hsh = hashlib.sha256(payload).digest()
                    w, h = scaled(64 + hsh[0] % 192, 64 + hsh[1] % 192)
                    recs.append(
                        {"asset_id": a, "width": w, "height": h,
                         "content": hsh * 2}
                    )
                    continue
                try:
                    if payload[:8] == b"\x89PNG\r\n\x1a\n":
                        rgb, _bits = decode_png(payload)
                        encode = encode_png
                    elif payload[:2] == b"\xff\xd8":
                        rgb, _bits = decode_jpeg(payload)
                        encode = encode_jpeg
                    else:
                        rgb, _bits = decode_bmp(payload)
                        encode = encode_bmp
                except UnsupportedMediaError as e:
                    raise NotImplementedError(
                        f"asset {a}: only BMP/PNG/JPEG resize "
                        f"without codec libs ({e}); use fake=True for "
                        "other formats"
                    ) from e
                ih, iw = rgb.shape[:2]
                w, h = scaled(iw, ih)
                if (w, h) == (iw, ih):
                    out = payload  # within bounds: byte-identical passthrough
                else:
                    ys = (np.arange(h) * ih) // h
                    xs = (np.arange(w) * iw) // w
                    out = encode(np.ascontiguousarray(rgb[ys][:, xs]))
                recs.append(
                    {"asset_id": a, "width": w, "height": h, "content": out}
                )
            yield pd.DataFrame.from_records(
                recs, columns=["asset_id", "width", "height", "content"]
            )

    return df.filter(F.col("modality") == "image").select(
        "asset_id", "content"
    ).mapInPandas(
        batches, schema=RESIZED_IMAGE_SCHEMA
    )


DOCUMENT_TEXT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("format", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("text", StringType()),
        StructField("n_chars", LongType()),
        StructField("title", StringType()),
        StructField("producer", StringType()),
        StructField("has_cid_fonts", BooleanType()),
    ]
)


def _decode_text_bytes(payload: bytes) -> str:
    """BOM-aware text decode: UTF-8/UTF-16 BOMs honored, then strict
    UTF-8, then Latin-1 (which never fails) — the standard ingest
    ladder for legacy text exports."""
    if payload[:3] == b"\xef\xbb\xbf":
        return payload[3:].decode("utf-8", "replace")
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return payload.decode("utf-16")
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("latin1")


def _extract_document_rec(asset_id, payload: bytes, mime: str) -> dict:
    """One asset's extraction record. Degrades to ``format='unknown'``
    on unparseable payloads (UnsupportedMediaError/ValueError from the
    decoders; RuntimeError/NotImplementedError from zipfile for
    encrypted members / unsupported compression — PK-prefixed payloads
    ONLY). Any other escape is a decoder bug and propagates: masking it
    as 'unknown' would silently drop real documents from the corpus.

    Module-level (not a closure) so the swallow-vs-raise contract is
    unit-testable without a Spark round-trip.
    """
    from commerce_sessionization_spark.functions.codecs import (
        UnsupportedMediaError,
    )
    from commerce_sessionization_spark.functions.docx import (
        extract_docx_text,
        parse_docx,
    )
    from commerce_sessionization_spark.functions.pdf import (
        extract_pdf_text,
        parse_pdf,
    )

    rec = {"asset_id": asset_id, "format": "unknown"}
    try:
        if str(mime).startswith("text/"):
            # plain text / markdown: decode is the parse.
            # BOM-aware (UTF-8/16) with Latin-1 fallback so
            # legacy exports never crash the pass.
            text = _decode_text_bytes(payload)
            rec.update(
                format=str(mime).split("/", 1)[1],
                n_pages=1,
                text=text,
                n_chars=len(text),
                has_cid_fonts=False,
            )
        elif payload[:5] == b"%PDF-":
            meta = parse_pdf(payload)
            text = "\f".join(extract_pdf_text(payload))
            rec.update(
                format="pdf",
                n_pages=meta["n_pages"],
                text=text,
                n_chars=len(text),
                title=meta["title"],
                producer=meta["producer"],
                has_cid_fonts=meta["has_cid_fonts"],
            )
        elif payload[:4] == b"PK\x03\x04":
            meta = parse_docx(payload)
            text = "\n".join(extract_docx_text(payload))
            rec.update(
                format="docx",
                n_pages=meta["n_paragraphs"],  # best unit it has
                text=text,
                n_chars=len(text),
                title=meta["title"],
                producer=meta["producer"],
                has_cid_fonts=False,
            )
    except (UnsupportedMediaError, ValueError):
        pass
    except (RuntimeError, NotImplementedError):
        if payload[:4] != b"PK\x03\x04":
            raise
    return rec


def extract_document_text(df: DataFrame) -> DataFrame:
    """Text + metadata from document payloads (PDF) — the document leg
    of the corpus pipeline, same Arrow-batched shape as the image/audio
    extractors. Per asset: page count, concatenated page text (pages
    joined by form-feed, so the sentence chunker can re-split), Info
    metadata (Title/Producer — generative-tool provenance lives there),
    and the ``has_cid_fonts`` flag (CJK embedded fonts decode wrong in
    the dependency-free path — route those to a real PDF stack).
    Encrypted or non-PDF payloads yield a format-only row; extraction
    never fails the pass. The output is documents-shaped enough to feed
    ``quality_score`` / dedup directly via ``text``.
    """
    cols = [f.name for f in DOCUMENT_TEXT_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in it:
            recs = [
                _extract_document_rec(a, bytes(c or b""), mt)
                for a, c, mt in zip(
                    pdf_batch["asset_id"],
                    pdf_batch["content"],
                    pdf_batch["mime_type"],
                )
            ]
            yield pd.DataFrame(recs, columns=cols)

    docs = df.filter(
        (F.col("modality") == "document")
        | (F.col("mime_type") == "application/pdf")
    ).select("asset_id", "content", "mime_type")
    return docs.mapInPandas(batches, DOCUMENT_TEXT_SCHEMA)
