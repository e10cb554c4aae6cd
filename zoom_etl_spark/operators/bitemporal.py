"""Bitemporal SCD: valid time × transaction time (ROADMAP item 7).

``scd2_history``/``scd2_maintain`` track VALID time only — what was
true when. A bitemporal table adds TRANSACTION time — what we BELIEVED
and when we believed it — so "as reported on date D" reconstruction
works even after late corrections rewrote history (the
regulatory-reporting requirement valid-time-only SCD cannot meet).

Model: each event is an assertion (key, valid_ts, value) arriving at
transaction sequence tx. The bitemporal row set satisfies, for EVERY
tx checkpoint T: slicing rows with ``tx_from ≤ T < tx_to`` yields
exactly the valid-time SCD2 history computed over the first T events —
that invariant is the correctness contract (oracle-checked for a fixed
T by the `bitemporal_asof` query, property-checked across several T in
tests).

Construction is a per-key fold in tx order (applyInPandas — sequential
within a key because belief revision is, parallel across keys, the
``ewma_smooth`` distribution argument): a sorted valid-time index per
key; each arrival either overwrites its exact valid point (close the
old version row) or splits its predecessor's interval (close the
predecessor's open row, reopen it shortened). Each event closes at most
two rows, so output is O(events) rows regardless of arrival order, and
per-key state is the key's version count — the same arrangement bound
as any SCD2 state. Emitted rows are append-only (closed rows never
mutate), so the construction incrementalizes batch-over-batch for free.
"""

from __future__ import annotations

from bisect import bisect_left, insort

import pandas as pd
from pyspark.sql import DataFrame

SCHEMA = ("user_id long, value long, valid_from timestamp, "
          "valid_to timestamp, tx_from long, tx_to long")


def _fold_key(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["tx"])
    key = pdf["user_id"].iloc[0]
    valids: list = []              # sorted valid timestamps
    cur: dict = {}                 # valid -> (value, tx_from)
    out: list[tuple] = []

    def succ(v):
        i = bisect_left(valids, v)
        j = i + 1 if i < len(valids) and valids[i] == v else i
        return valids[j] if j < len(valids) else None

    for r in pdf.itertuples():
        v, val, tx = r.valid, int(r.value), int(r.tx)
        if v in cur:
            old_val, old_from = cur[v]
            out.append((key, old_val, v, succ(v), old_from, tx))
            cur[v] = (val, tx)
            continue
        i = bisect_left(valids, v)
        if i > 0:
            pv = valids[i - 1]
            p_val, p_from = cur[pv]
            # predecessor's open interval [pv, old_succ) shrinks to [pv, v)
            out.append((key, p_val, pv, succ(pv), p_from, tx))
            cur[pv] = (p_val, tx)
        insort(valids, v)
        cur[v] = (val, tx)
    for v in valids:
        val, tx_from = cur[v]
        out.append((key, val, v, succ(v), tx_from, None))
    return pd.DataFrame(
        out, columns=["user_id", "value", "valid_from", "valid_to",
                      "tx_from", "tx_to"])


def bitemporal_history(df: DataFrame, key: str = "user_id",
                       valid: str = "valid", value: str = "value",
                       tx: str = "tx") -> DataFrame:
    """Build the bitemporal row set from an assertion log. Input columns
    are renamed to the canonical (user_id, valid, value, tx); output is
    :data:`SCHEMA` with NULL valid_to = open valid interval and NULL
    tx_to = currently believed."""
    canon = (df.select(df[key].alias("user_id"), df[valid].alias("valid"),
                       df[value].alias("value"), df[tx].alias("tx")))
    # pin the exchange width: the fold's cost is Python rows, not bytes,
    # so AQE's byte-based coalescing would serialize it onto 1-2 tasks
    # (the ewma_smooth lesson); an explicit key repartition is exempt
    # and satisfies the applyInPandas distribution with no extra shuffle
    n = df.sparkSession.sparkContext.defaultParallelism
    return (canon.repartition(n, "user_id")
                 .groupBy("user_id").applyInPandas(_fold_key, SCHEMA))


def as_of(bt: DataFrame, tx_checkpoint) -> DataFrame:
    """Belief slice: the valid-time SCD2 history as reported at
    transaction ``tx_checkpoint`` — rows whose tx interval covers it."""
    from pyspark.sql import functions as F
    return (bt.filter((F.col("tx_from") <= F.lit(tx_checkpoint))
                      & (F.col("tx_to").isNull()
                         | (F.col("tx_to") > F.lit(tx_checkpoint))))
              .drop("tx_from", "tx_to"))
