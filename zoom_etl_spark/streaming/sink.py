"""foreachBatch upsert sink — the reference's JDBC upsert loader shape
(reference src/db/load.py:41-50: ``execute_values`` over
``INSERT … ON CONFLICT (key) DO UPDATE``, applied in ``page_size``
pages) re-expressed for Structured Streaming.

Two halves, each the honest Spark analog of one half of the reference:

* :class:`UpsertSink` — the micro-batch merge. Each batch is last-wins
  deduped in-batch (webhook redelivery, ref handler.py:60-74), keyed-
  merge-upserted into the table, and committed ATOMICALLY WITH a batch-id
  ledger (``TableGroup`` manifest meta). foreachBatch is at-least-once —
  after a sink failure Spark redelivers the same ``batch_id`` — so the
  ledger fences replays: an already-applied batch is a no-op, which is
  what makes the pipeline exactly-once end-to-end. This is the same
  watermark-guarded idempotency contract as the reference's Airflow rerun,
  done per micro-batch instead of per DAG run.

* :func:`paged_writes` — the transport paging. A real JDBC target applies
  each partition's rows in bounded pages (execute_values page_size) to
  cap per-transaction memory/locks; the page chunker is separated from
  the transport so tests inject a recording client where production
  injects psycopg2/JDBC. Runs executor-side inside ``foreachPartition``
  — the driver never sees rows.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

from pyspark.sql import DataFrame

from ..operators.merge import merge_upsert
from ..operators.txn import TableGroup
from ..operators.windows import last_wins


def paged_writes(rows: Iterator[Any], page_size: int,
                 execute_page: Callable[[list[Any]], None]) -> int:
    """Apply rows in bounded pages (ref load.py:41-50 execute_values
    shape): accumulate up to ``page_size`` rows, flush, repeat. Returns
    pages flushed. Memory is O(page_size) regardless of partition size."""
    page: list[Any] = []
    n_pages = 0
    for row in rows:
        page.append(row)
        if len(page) >= page_size:
            execute_page(page)
            n_pages += 1
            page = []
    if page:
        execute_page(page)
        n_pages += 1
    return n_pages


class UpsertSink:
    """Idempotent keyed-upsert sink over a TableGroup table.

    Use as ``stream.writeStream.foreachBatch(sink).start()``. State
    machine per micro-batch: fence (ledger) → dedup (in-batch last-wins)
    → merge (keyed upsert) → atomic commit (data + ledger together).
    """

    def __init__(self, group: TableGroup, table: str, keys: list[str],
                 version_cols: list[str],
                 page_writer: Callable[[DataFrame], None] | None = None):
        self.group = group
        self.table = table
        self.keys = keys
        self.version_cols = version_cols
        self.page_writer = page_writer  # optional JDBC-transport half
        self.applied = 0
        self.skipped = 0

    def last_batch(self) -> int:
        return int(self.group.manifest().get("meta", {})
                   .get(f"last_batch:{self.table}", -1))

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch():
            # redelivered batch (sink crashed after commit, before Spark
            # recorded progress): already applied — exactly-once no-op
            self.skipped += 1
            return
        from pyspark.sql import functions as F
        deduped = last_wins(batch, keys=self.keys,
                            version=[F.col(c) for c in self.version_cols])
        target = self.group.read(batch.sparkSession, self.table)
        merged = merge_upsert(target, deduped.select(*target.columns),
                              keys=self.keys)
        if self.page_writer is not None:
            self.page_writer(deduped)  # mirror to the JDBC-shaped target
        self.group.publish({self.table: merged},
                           meta={f"last_batch:{self.table}": int(batch_id)})
        self.applied += 1
