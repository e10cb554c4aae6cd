"""Execution-cost observability: per-query shuffle / spill / input bytes.

Wall-clock seconds are noisy on shared machines; bytes moved through the
shuffle are the stable signal for plan regressions (a join that stops
broadcasting shows up as megabytes, not milliseconds). The scraper reads
cumulative completed-stage metrics from the Spark UI REST API (the HTTP
face of the driver's AppStatusStore — present in local mode too) and
reports per-query deltas between consecutive snapshots.

The reference has no equivalent: its only cost signal is CloudWatch wall
time per Airflow task (SURVEY.md §6). Here cost is attributed per query
and lands in the bench JSON, so a 100 TB regression is visible at sf0.1.

Degrades gracefully: with ``spark.ui.enabled=false`` (the default test
session) every snapshot is ``None`` and callers skip the metrics block.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import SparkSession

# REST stage fields we aggregate (v1 API, stable since Spark 1.4)
FIELDS = (
    "inputBytes",          # bytes read from sources (scan pruning signal)
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
)


class StageMetrics:
    """Snapshot/delta reader over cumulative completed-stage totals.

    The UI store evicts old stages past ``spark.ui.retainedStages``; naive
    sum-over-retained snapshots would shrink after eviction and produce
    negative deltas. Instead each completed stage attempt is counted into a
    running total exactly once (completed-stage metrics are final), keyed by
    (stageId, attemptId) — totals are monotonic regardless of eviction.
    """

    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self._base = sc.uiWebUrl  # None when the UI is disabled
        self._app = sc.applicationId
        self._seen: set[tuple[int, int]] = set()
        self._cum = dict.fromkeys(FIELDS, 0)
        self._last = self._snapshot()

    @property
    def enabled(self) -> bool:
        return self._base is not None and self._last is not None

    def _snapshot(self) -> dict[str, int] | None:
        if not self._base:
            return None
        url = f"{self._base}/api/v1/applications/{self._app}/stages?status=complete"
        try:
            with urllib.request.urlopen(url, timeout=10) as resp:
                stages = json.load(resp)
        except Exception:
            return None
        for stage in stages:
            key = (int(stage.get("stageId", -1)), int(stage.get("attemptId", 0)))
            if key in self._seen:
                continue
            self._seen.add(key)
            for f in FIELDS:
                self._cum[f] += int(stage.get(f) or 0)
        return dict(self._cum)

    def delta(self) -> dict[str, int] | None:
        """Metrics accrued since the previous snapshot (or init)."""
        cur = self._snapshot()
        prev, self._last = self._last, cur
        if cur is None or prev is None:
            return None
        return {f: max(0, cur[f] - prev[f]) for f in FIELDS}


def mb(n_bytes: int) -> float:
    return round(n_bytes / 1e6, 2)
