"""Custom stateful streaming operators (applyInPandasWithState) — the
escape hatch when built-in windows/watermarks can't express the state
machine (SURVEY §2.9; the engine analog of the reference's stateful
watermark Variable, generalized to arbitrary per-key state).

Example operator: per-user lifetime counters (events seen, value sum,
last event time) maintained across micro-batches. GroupStateTimeout is
off — state lives for the stream's lifetime; production variants key
eviction off event-time timeouts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType,
                               TimestampType)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType(), True),
    StructField("n_events", LongType(), True),
    StructField("value_sum", DoubleType(), True),
    StructField("last_ts", TimestampType(), True),
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType(), True),
    StructField("value_sum", DoubleType(), True),
    StructField("last_ts_us", LongType(), True),  # state can't hold timestamps
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n, vsum, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        vsum += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].max().value // 1000))
    state.update((n, vsum, last_us))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "value_sum": [vsum],
        "last_ts": [pd.Timestamp(last_us * 1000)],
    })


def user_lifetime_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running totals as a stateful stream (update output mode)."""
    return (events_stream
            .groupBy("user_id")
            .applyInPandasWithState(_update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))
