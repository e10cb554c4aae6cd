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
from pyspark.sql.types import (BooleanType, DoubleType, LongType, StringType,
                               StructField, StructType, TimestampType)

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


# ---------------------------------------------------------------- SCD2 IVM

SCD2_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType(), True),
    StructField("event_id", LongType(), True),
    StructField("state", StringType(), True),
    StructField("valid_from", TimestampType(), True),
    StructField("valid_to", TimestampType(), True),
    StructField("is_current", BooleanType(), True),
])

# the open version only: (event_id, state, valid_from_us)
SCD2_STATE_SCHEMA = StructType([
    StructField("event_id", LongType(), True),
    StructField("state", StringType(), True),
    StructField("from_us", LongType(), True),
])


def _scd2_update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
    cur = state.get if state.exists else None
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    out: list[tuple] = []
    for r in rows.itertuples():
        ts_us = int(r.ts.value // 1000)
        if cur is not None and ts_us < cur[2]:
            # Cross-batch regression: an already-open version is newer than
            # this row. Correct SCD2 under out-of-order arrival needs version
            # buffering + retraction; until then fail loudly rather than emit
            # a silently-wrong history (e.g. if the source ever switches to
            # multiple files / maxFilesPerTrigger).
            raise ValueError(
                f"scd2_maintain: out-of-order event for key {key[0]!r} "
                f"(ts {ts_us}us < open-version start {cur[2]}us); "
                "source must deliver per-key event-time order across batches")
        if cur is not None:
            # new version closes the open one: emit its finished interval
            out.append((key[0], cur[0], cur[1], cur[2], ts_us, False))
        cur = (int(r.event_id), str(r.event_type), ts_us)
    if cur is None:
        return
    state.update(cur)
    out.append((key[0], cur[0], cur[1], cur[2], None, True))
    yield pd.DataFrame(
        {"user_id": [o[0] for o in out],
         "event_id": [o[1] for o in out],
         "state": [o[2] for o in out],
         "valid_from": [pd.Timestamp(o[3] * 1000) for o in out],
         "valid_to": [pd.Timestamp(o[4] * 1000) if o[4] is not None else pd.NaT
                      for o in out],
         "is_current": [o[5] for o in out]})


def scd2_maintain(events_stream: DataFrame) -> DataFrame:
    """Continuously-maintained SCD2 history (ROADMAP item 5): the
    streaming IVM analog of the batch ``scd2_history`` query.

    State per key is ONLY the open version (constant per key — not the
    history), so state size is bounded by key cardinality regardless of
    stream length. Each micro-batch emits the intervals it closed plus
    the (re-emitted) open row; a closed emission for an event_id
    supersedes that event_id's earlier open emission, so the materialized
    view is ``scd2_finalize`` over everything emitted.

    Assumes per-key event-time order ACROSS micro-batches (within a
    batch, rows are sorted here); a cross-batch regression raises rather
    than emitting a silently-wrong history. Out-of-order input needs
    version buffering in state — see docs/plan_audit notes.
    """
    return (events_stream
            .groupBy("user_id")
            .applyInPandasWithState(_scd2_update, SCD2_OUTPUT_SCHEMA,
                                    SCD2_STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


def scd2_finalize(emitted: DataFrame) -> DataFrame:
    """Collapse the emitted update log to the current SCD2 view: for each
    (user_id, event_id) version, the closed emission (is_current=false)
    supersedes the open one it re-stated."""
    from ..operators.windows import topk_per_group
    from pyspark.sql import functions as F
    return topk_per_group(
        emitted, keys=["user_id", "event_id"],
        order=[F.col("is_current").asc()], k=1)


# ----------------------------------------------------------- last-wins IVM

LASTWINS_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType(), True),
    StructField("event_id", LongType(), True),
    StructField("event_type", StringType(), True),
    StructField("ts", TimestampType(), True),
    StructField("value", DoubleType(), True),
])

LASTWINS_STATE_SCHEMA = StructType([
    StructField("ts_us", LongType(), True),
    StructField("event_id", LongType(), True),
    StructField("event_type", StringType(), True),
    StructField("value", DoubleType(), True),
])


def _lastwins_update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
    cur = state.get if state.exists else None
    for pdf in pdfs:
        for r in pdf.itertuples():
            cand = (int(r.ts.value // 1000), int(r.event_id),
                    str(r.event_type), float(r.value))
            if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                cur = cand
    if cur is None:
        return
    state.update(cur)
    yield pd.DataFrame({
        "user_id": [key[0]], "event_id": [cur[1]], "event_type": [cur[2]],
        "ts": [pd.Timestamp(cur[0] * 1000)], "value": [cur[3]]})


def lastwins_maintain(events_stream: DataFrame) -> DataFrame:
    """Continuously-maintained last-wins view (ROADMAP item 5): per key,
    the payload of the latest (ts, event_id) — the streaming IVM analog
    of the batch ``dedup_last_wins`` query, and the maintained form of
    the reference's idempotent-upsert contract (webhook redelivery,
    ref handler.py:60-74).

    Unlike the SCD2 operator this one is fully OUT-OF-ORDER TOLERANT
    across micro-batches: state keeps only the max (ts, event_id) pair
    seen, so a late replay can never regress the view, and redelivered
    duplicates are no-ops. State is one fixed-width row per key —
    bounded by key cardinality, independent of stream length."""
    return (events_stream
            .groupBy("user_id")
            .applyInPandasWithState(_lastwins_update, LASTWINS_OUTPUT_SCHEMA,
                                    LASTWINS_STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


def lastwins_finalize(emitted: DataFrame) -> DataFrame:
    """Collapse the update log to the converged view: per-key emissions
    are monotone in (ts, event_id), so the latest emission is the max."""
    from ..operators.windows import topk_per_group
    from pyspark.sql import functions as F
    return topk_per_group(
        emitted, keys=["user_id"],
        order=[F.col("ts").desc(), F.col("event_id").desc()], k=1)
