"""Streaming joins: stream-static enrichment and stream-stream attribution.

- ``enrich_stream``: per-micro-batch broadcast join of the event stream
  against a (slowly-changing) dimension. Stateless — the dim re-resolves
  every batch, so a refreshed dim table takes effect on the next trigger;
  no state store involved.
- ``attribute_purchases``: stream-stream interval join (the streaming
  analogue of the batch as-of join): each purchase matches the same
  user's views in the preceding ``max_lag``. Both sides are watermarked,
  and the interval condition bounds the join state — Spark evicts a
  buffered view once the watermark passes ``view.ts + max_lag``, so
  state is O(events in the lag horizon), never the whole stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: Column | list[str],
    how: str = "left",
) -> DataFrame:
    """Join a stream with a static dimension (broadcast, stateless)."""
    return events.join(F.broadcast(dim), on, how)


def attribute_purchases(
    views: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Purchases joined to the same user's views within ``max_lag`` before.

    Output: one row per (view, purchase) pair with both timestamps — the
    downstream can argmax to last-touch. Inner join: a purchase with no
    admissible view does not appear (use the batch as-of join for
    left-outer semantics over stored data).
    """
    v = views.select(
        F.col(user_col).alias("v_user"),
        F.col(ts_col).alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col(user_col).alias(user_col),
        F.col(ts_col).alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        v,
        F.expr(
            f"v_user = {user_col} AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {max_lag}"
        ),
        "inner",
    ).select(user_col, "view_ts", "purchase_ts")
