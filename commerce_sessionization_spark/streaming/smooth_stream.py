"""Streaming exponential smoothing: the stateful twin of
``operators.timeseries.exp_smooth``.

State per series is two integers — (last_idx, s_micro) — updated by the
same exact integer recurrence ``s = (num·x + (den−num)·s) // den``, so a
stream that delivers observations in idx order across micro-batches
emits exactly the batch operator's outputs (parity-tested). Rows at or
behind the already-processed idx are dropped: a replayed micro-batch
(at-least-once upstream) re-derives nothing and double-smooths nothing —
the state advance is idempotent under re-delivery of processed rows.

Scale: state is O(series), bytes per key constant; sequentiality is per
series only (the ``pack_sequences`` contract), so throughput scales with
the number of series.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

_STATE_SCHEMA = StructType(
    [StructField("last_idx", LongType()), StructField("s_micro", LongType())]
)


def _make_smooth_fn(
    series_col: str,
    idx_col: str,
    value_col: str,
    alpha_num: int,
    alpha_den: int,
):
    def smooth(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover — no timeout configured
            state.remove()
            return
        (series,) = key
        last_idx, s = state.get if state.exists else (None, None)

        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(idx_col, kind="mergesort", ignore_index=True)
        if last_idx is not None:
            batch = batch[batch[idx_col] > last_idx]
        if batch.empty:
            return

        out = []
        for x in batch[value_col].to_list():
            s = (
                int(x)
                if s is None
                else (alpha_num * int(x) + (alpha_den - alpha_num) * s)
                // alpha_den
            )
            out.append(s)
        batch = batch.assign(s_micro=out)
        last_idx = int(batch[idx_col].iloc[-1])
        state.update((last_idx, int(s)))
        yield batch[[series_col, idx_col, value_col, "s_micro"]]

    return smooth


def exp_smooth_stream(
    observations: DataFrame,
    series_col: str = "event_type",
    idx_col: str = "idx",
    value_micro_col: str = "x_micro",
    alpha_num: int = 1,
    alpha_den: int = 4,
) -> DataFrame:
    """Per-series streaming EWMA over an (idx-ordered) observation stream.

    Emits every fresh observation with its smoothed ``s_micro``; already-
    processed idx values are dropped (replay-safe). ProcessingTimeTimeout
    with no timeout set keeps state until the series stops being
    observed — an eviction policy is the caller's call (observation
    streams are typically bounded by series count, not time).
    """
    out_schema = StructType(
        [
            StructField(series_col, StringType()),
            StructField(idx_col, LongType()),
            StructField(value_micro_col, LongType()),
            StructField("s_micro", LongType()),
        ]
    )
    fn = _make_smooth_fn(
        series_col, idx_col, value_micro_col, alpha_num, alpha_den
    )
    return observations.groupBy(series_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


_HOLT_STATE_SCHEMA = StructType(
    [
        StructField("last_idx", LongType()),
        StructField("s_micro", LongType()),
        StructField("b_micro", LongType()),
    ]
)


def _make_holt_fn(
    series_col: str,
    idx_col: str,
    value_col: str,
    alpha_num: int,
    alpha_den: int,
    beta_num: int,
    beta_den: int,
):
    def smooth(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover — no timeout configured
            state.remove()
            return
        (series,) = key
        last_idx, s, b = state.get if state.exists else (None, None, None)

        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(idx_col, kind="mergesort", ignore_index=True)
        if last_idx is not None:
            batch = batch[batch[idx_col] > last_idx]
        if batch.empty:
            return

        ss, bs = [], []
        for x in batch[value_col].to_list():
            if s is None:
                s, b = int(x), 0
            else:
                prev = s
                s = (
                    alpha_num * int(x) + (alpha_den - alpha_num) * (s + b)
                ) // alpha_den
                b = (
                    beta_num * (s - prev) + (beta_den - beta_num) * b
                ) // beta_den
            ss.append(s)
            bs.append(b)
        batch = batch.assign(
            s_micro=ss, b_micro=bs,
            forecast_micro=[a + c for a, c in zip(ss, bs)],
        )
        last_idx = int(batch[idx_col].iloc[-1])
        state.update((last_idx, int(s), int(b)))
        yield batch[
            [series_col, idx_col, value_col,
             "s_micro", "b_micro", "forecast_micro"]
        ]

    return smooth


def holt_smooth_stream(
    observations: DataFrame,
    series_col: str = "event_type",
    idx_col: str = "idx",
    value_micro_col: str = "x_micro",
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 4,
) -> DataFrame:
    """Streaming Holt level+trend smoothing — the stateful twin of
    ``operators.timeseries.holt_smooth``, same replay-idempotence
    contract as ``exp_smooth_stream`` with a three-integer state
    (last_idx, level, trend). Emits level, trend, and the one-step
    forecast per fresh observation."""
    out_schema = StructType(
        [
            StructField(series_col, StringType()),
            StructField(idx_col, LongType()),
            StructField(value_micro_col, LongType()),
            StructField("s_micro", LongType()),
            StructField("b_micro", LongType()),
            StructField("forecast_micro", LongType()),
        ]
    )
    fn = _make_holt_fn(
        series_col, idx_col, value_micro_col,
        alpha_num, alpha_den, beta_num, beta_den,
    )
    return observations.groupBy(series_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
