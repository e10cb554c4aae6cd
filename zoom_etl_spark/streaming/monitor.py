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


def progress_record(raw: dict) -> dict:
    """One :class:`StreamMetrics` batch record from a progress dict —
    either the parsed listener-event JSON or an entry of
    ``StreamingQuery.recentProgress`` (a dict subclass since Spark 4);
    both carry the same camelCase keys. ``recentProgress`` is populated
    SYNCHRONOUSLY by the streaming engine as each micro-batch finishes,
    so a bounded drain can read its full batch history right after
    ``awaitTermination()`` with no listener-bus delivery wait (the
    async listener path needed a poll-with-deadline for the same
    facts)."""
    et = raw.get("eventTime", {}) or {}
    rec = {
        "batch_id": raw.get("batchId"),
        "num_input_rows": raw.get("numInputRows"),
        "state": [],
        "watermark": et.get("watermark"),
        "event_max": et.get("max"),
        "event_min": et.get("min"),
    }
    for op in raw.get("stateOperators", []) or []:
        rec["state"].append({
            "operator": op.get("operatorName"),
            "rows_total": op.get("numRowsTotal"),
            "rows_updated": op.get("numRowsUpdated"),
            "rows_dropped_by_watermark":
                op.get("numRowsDroppedByWatermark"),
            "memory_used_bytes": op.get("memoryUsedBytes"),
        })
    return rec


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
        try:
            raw = json.loads(p.json)
        except Exception:
            raw = {}
        rec = progress_record(raw)
        rec["batch_id"] = p.batchId
        rec["num_input_rows"] = p.numInputRows
        self._by_query[p.name or p.id].append(rec)

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    # caller surface --------------------------------------------------
    def snapshot(self, name: str) -> list[dict]:
        return list(self._by_query.get(name, ()))

    def feed(self, name: str, rec: dict) -> None:
        """Inject a batch record directly (same shape onQueryProgress
        produces). Exists so alert rules can be exercised/replayed
        against a recorded history without a live stream — the alerting
        path must be testable offline."""
        self._by_query[name].append(rec)

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


def state_bytes(metrics: StreamMetrics, name: str) -> list[int]:
    """Per-batch state-store memory (summed over state operators) — the
    SIZE companion to :func:`state_rows`: row counts can plateau while
    per-row payloads balloon (e.g. a collect_list in state), so leak
    detection must watch both."""
    out = []
    for rec in metrics.snapshot(name):
        out.append(sum(op.get("memory_used_bytes") or 0
                       for op in rec["state"]))
    return out


# ---------------------------------------------------------------------------
# Alert routing — rules over the captured per-batch facts, dispatched to
# severity-routed sinks. The rules are pure functions of the recorded
# batch history (deterministic, driver-side, testable without a live
# alerting backend); a production deployment registers a pager/Slack
# callable per severity and calls ``evaluate`` from the same listener
# thread or a scheduled sweep.

class Alert:
    __slots__ = ("rule", "severity", "query", "batch_id", "detail")

    def __init__(self, rule, severity, query, batch_id, detail):
        self.rule, self.severity = rule, severity
        self.query, self.batch_id, self.detail = query, batch_id, detail

    def __repr__(self):
        return (f"Alert({self.rule}/{self.severity} q={self.query} "
                f"batch={self.batch_id}: {self.detail})")


class AlertRouter:
    """Evaluates health rules against a :class:`StreamMetrics` history
    and routes resulting alerts to per-severity sinks.

    Built-in rules (each a deterministic function of the batch log):

    - ``fully_late_batch`` (**critical**): a batch whose entire input
      was behind the watermark — every row silently discarded.
    - ``state_growth`` (**warning**): total state rows strictly
      increased over the last ``growth_window`` batches — the leak
      signature for an operator expected to plateau.
    - ``watermark_stalled`` (**warning**): input keeps arriving but the
      watermark has not advanced for ``stall_window`` batches — late
      data will pile up and downstream windows never close.

    Sinks are callables ``alert -> None`` registered per severity with
    :meth:`route_to`; ``evaluate`` is idempotent per (rule, batch_id) —
    re-sweeping the same history does not re-fire delivered alerts
    (exactly the dedup a paging integration needs)."""

    def __init__(self, metrics: StreamMetrics, growth_window: int = 4,
                 stall_window: int = 3):
        self._metrics = metrics
        self._growth_window = growth_window
        self._stall_window = stall_window
        self._sinks: dict[str, list] = defaultdict(list)
        self._delivered: set[tuple] = set()
        self.alerts: list[Alert] = []

    def route_to(self, severity: str, sink) -> "AlertRouter":
        self._sinks[severity].append(sink)
        return self

    def _emit(self, rule, severity, query, batch_id, detail):
        key = (rule, query, batch_id)
        if key in self._delivered:
            return
        self._delivered.add(key)
        a = Alert(rule, severity, query, batch_id, detail)
        self.alerts.append(a)
        for sink in self._sinks.get(severity, ()):
            sink(a)

    def evaluate(self, name: str) -> list[Alert]:
        """Sweep the recorded history for ``name`` and fire any new
        alerts; returns all alerts raised so far for the query."""
        hist = self._metrics.snapshot(name)
        for bid in self._metrics.fully_late_batches(name):
            self._emit("fully_late_batch", "critical", name, bid,
                       "entire batch behind watermark — rows discarded")
        rows = state_rows(self._metrics, name)
        w = self._growth_window
        if len(rows) >= w:
            tail = rows[-w:]
            if all(tail[i] < tail[i + 1] for i in range(w - 1)):
                self._emit("state_growth", "warning", name,
                           hist[-1]["batch_id"],
                           f"state rows rose {tail[0]}→{tail[-1]} "
                           f"over last {w} batches")
        s = self._stall_window
        if len(hist) >= s:
            tail = hist[-s:]
            wms = [rec.get("watermark") for rec in tail]
            fed = sum(rec["num_input_rows"] for rec in tail)
            if (fed > 0 and all(wm is not None for wm in wms)
                    and len(set(wms)) == 1 and any(rec["state"] for rec in tail)):
                self._emit("watermark_stalled", "warning", name,
                           tail[-1]["batch_id"],
                           f"watermark pinned at {wms[-1]} for {s} "
                           f"batches while {fed} rows arrived")
        return [a for a in self.alerts if a.query == name]
