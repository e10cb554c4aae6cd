"""Streaming observability: per-batch progress + state-operator metrics.

The reference's pipeline observability is log lines around each task
(reference airflow/dags/etl_process.py task logging); a streaming engine
needs structured per-batch facts instead: rows ingested, rows the
watermark dropped, state rows carried — the numbers that answer "is the
stream healthy / is state leaking / are we silently losing late data".
Structured Streaming already computes all of them per micro-batch; this
module just captures them through a ``StreamingQueryListener`` into a
driver-side registry the caller can assert on (tests) or ship to a
metrics sink (production).

Scale posture: listener events are driver-side metadata (one small dict
per micro-batch, regardless of data volume) — capturing them costs
nothing on the executors. The registry is bounded per query by
``max_batches`` (ring semantics) so a long-running stream cannot grow
driver memory.
"""

from __future__ import annotations

import json
from collections import defaultdict, deque

from pyspark.sql.streaming.listener import StreamingQueryListener


class StreamMetrics(StreamingQueryListener):
    """Collects per-batch progress for every query on the session.

    ``snapshot(name)`` returns the recorded batches for a query name:
    dicts with batch_id, num_input_rows, and per-state-operator
    (rows_total, rows_dropped_by_watermark). Drop counts are the
    silent-data-loss signal a watermarked pipeline must alert on."""

    def __init__(self, max_batches: int = 256):
        self._by_query: dict[str, deque] = defaultdict(
            lambda: deque(maxlen=max_batches))

    # StreamingQueryListener interface -------------------------------
    def onQueryStarted(self, event):  # noqa: N802 (Spark API casing)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "state": [],
        }
        try:
            raw = json.loads(p.json)
        except Exception:
            raw = {}
        et = raw.get("eventTime", {}) or {}
        rec["watermark"] = et.get("watermark")
        rec["event_max"] = et.get("max")
        rec["event_min"] = et.get("min")
        for op in raw.get("stateOperators", []) or []:
            rec["state"].append({
                "operator": op.get("operatorName"),
                "rows_total": op.get("numRowsTotal"),
                "rows_updated": op.get("numRowsUpdated"),
                "rows_dropped_by_watermark":
                    op.get("numRowsDroppedByWatermark"),
            })
        self._by_query[p.name or p.id].append(rec)

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    # caller surface --------------------------------------------------
    def snapshot(self, name: str) -> list[dict]:
        return list(self._by_query.get(name, ()))

    def dropped_by_watermark(self, name: str) -> int:
        """Total late rows a STATE OPERATOR discarded. Caveat learned
        empirically (and worth keeping): streaming aggregations and
        dedup filter late rows BEFORE the state operator, so this
        counter stays 0 for them — it reports for operators that admit
        rows into state first (stream-stream joins, flatMapGroups).
        For aggregations use :meth:`fully_late_batches`."""
        total = 0
        for rec in self._by_query.get(name, ()):
            for op in rec["state"]:
                total += op.get("rows_dropped_by_watermark") or 0
        return total

    def fully_late_batches(self, name: str) -> list[int]:
        """Batch ids whose ENTIRE input was behind the current watermark
        (event-time max < watermark) — the replay/backfill-arrived-too-
        late signature: every row of such a batch is silently discarded
        by a watermarked aggregation. The comparison uses the progress
        report's own ISO-8601 strings (lexicographically ordered)."""
        out = []
        for rec in self._by_query.get(name, ()):
            wm, mx = rec.get("watermark"), rec.get("event_max")
            if wm and mx and mx < wm:
                out.append(rec["batch_id"])
        return out


class watched:
    """Context manager attaching a :class:`StreamMetrics` listener for
    the duration of a drain::

        with watched(spark) as m:
            run_available_now(out, "q", ...)
        assert m.dropped_by_watermark("q") == 0
    """

    def __init__(self, spark):
        self._spark = spark
        self.metrics = StreamMetrics()

    def __enter__(self) -> StreamMetrics:
        self._spark.streams.addListener(self.metrics)
        return self.metrics

    def __exit__(self, *exc):
        self._spark.streams.removeListener(self.metrics)
        return False


def state_rows(metrics: StreamMetrics, name: str) -> list[int]:
    """Per-batch total state rows (summed over state operators) — the
    leak signal: for a bounded-keyspace operator this must plateau at
    the keyspace size; unbounded growth across batches means state is
    never evicted and memory pressure is only a matter of time."""
    out = []
    for rec in metrics.snapshot(name):
        out.append(sum(op.get("rows_total") or 0 for op in rec["state"]))
    return out
