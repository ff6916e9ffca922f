"""Streaming exact dedup: at-most-once per key within the watermark.

Upstream at-least-once delivery (Kafka replays, file-drop retries)
duplicates events; this drops re-deliveries before they reach stateful
consumers. ``dropDuplicatesWithinWatermark`` keeps one state row per key
and — unlike plain ``dropDuplicates`` on a stream, whose state grows
without bound — evicts it once the watermark passes the key's event
time, so state is O(keys per watermark horizon), not O(keys ever seen).

A duplicate arriving *after* the watermark expired its key is readmitted
— the horizon is the dedup guarantee's boundary, the same contract the
stateful sessionizer documents for late events (SURVEY §2.8).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key within the watermark horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
