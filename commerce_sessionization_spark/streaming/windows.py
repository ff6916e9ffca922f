"""Time-windowed streaming aggregations (tumbling / sliding).

The third windowing mode next to ``session_window`` (gap-based, in
``sessionize_stream``) and the per-event stateful sessionizer: fixed
time buckets for rate/volume monitoring. Watermark-finalized, so in
append mode a window emits exactly once when it can no longer receive
admissible data — state is O(open windows × keys) and evicts itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event counts per (time window, *keys).

    ``slide=None`` → tumbling; a shorter ``slide`` → sliding (each event
    lands in window/slide buckets). Output: window bounds, keys, n_events.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide or window), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )
