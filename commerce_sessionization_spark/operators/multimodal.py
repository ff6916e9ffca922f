"""Multimodal column plumbing: media as opaque binary + typed metadata.

The Spark-side contract is real and tested — schema (``schemas.MEDIA_SCHEMA``),
Arrow-batched ``mapInPandas`` plumbing, partitioning by modality, stable
output schemas. The actual codec work is stubbed: image/audio libs are not
in this container, so ``decode`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded from the
payload bytes) produces plausible features so the pipeline shape is testable
end-to-end.

At 100 TB: binary payloads dominate row size — always project metadata-only
when features suffice (column pruning keeps payload IO at zero), partition
by ``modality`` so a per-modality pipeline prunes the rest, and size
``maxRecordsPerFile`` low for payload tables.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
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


def extract_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + featurize image payloads via Arrow-batched ``mapInPandas``.

    Real decode is STUBBED (``NotImplementedError``) — container lacks image
    libs; ``fake=True`` routes to the deterministic fake so the plumbing
    (batching, schema, partition behavior) is fully exercised.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv; rerun with fake=True"
                )
            yield pd.DataFrame.from_records(
                _fake_image_features(a, c)
                for a, c in zip(pdf["asset_id"], pdf["content"])
            )

    return df.filter(F.col("modality") == "image").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def extract_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real audio decode requires soundfile/librosa; rerun with fake=True"
                )
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                h = hashlib.sha256(c or b"").digest()
                recs.append(
                    {
                        "asset_id": a,
                        "sample_rate": 16000,
                        "duration_sec": round(len(c or b"") / 32000.0, 6),
                        "rms": round(h[0] / 255.0, 6),
                    }
                )
            yield pd.DataFrame.from_records(recs)

    return df.filter(F.col("modality") == "audio").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )


def sample_video_frames(
    df: DataFrame, every_n: int = 10, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """Frame sampling for video payloads (stubbed decode; fake yields
    deterministic per-frame hashes so downstream joins are testable)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real video decode requires ffmpeg bindings; rerun with fake=True"
                )
            recs = []
            for a, c in zip(pdf["asset_id"], pdf["content"]):
                n = min(max_frames, 1 + (len(c or b"") // max(every_n, 1)) % max_frames)
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
            yield pd.DataFrame.from_records(
                recs,
                columns=["asset_id", "frame_idx", "frame_phash"],
            )

    return df.filter(F.col("modality") == "video").mapInPandas(
        batches, schema=FRAME_SAMPLE_SCHEMA
    )


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Per-modality rollup over modality + payload size only (no decode)."""
    return df.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.round(F.avg(F.length("content")), 2).alias("avg_bytes"),
    )
