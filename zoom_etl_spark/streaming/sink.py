"""foreachBatch upsert sink — the reference's JDBC upsert loader shape
(reference src/db/load.py:41-50: ``execute_values`` over
``INSERT … ON CONFLICT (key) DO UPDATE``, applied in ``page_size``
pages) re-expressed for Structured Streaming.

Two halves, each the honest Spark analog of one half of the reference:

* :class:`UpsertSink` — the micro-batch merge. Each batch is last-wins
  deduped in-batch (webhook redelivery, ref handler.py:60-74), then
  VERSION-AWARE merged into the table — the target row and the update
  row compete on ``version_cols``, so an out-of-order older event in a
  later micro-batch can never overwrite a newer row (global last-wins,
  not batch-order-wins; the distinction only shows up with >1 batch,
  e.g. maxFilesPerTrigger or a multi-file source). The merge is
  committed ATOMICALLY WITH a batch-id ledger (``TableGroup`` manifest
  meta). foreachBatch is at-least-once —
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


def duckdb_upsert_writer(db_path: str, table: str, keys: list[str],
                         cols: list[str], version_cols: list[str],
                         page_size: int = 500, max_attempts: int = 5,
                         n_connections: int = 4) -> Callable[[DataFrame], None]:
    """The reference's JDBC upsert transport (src/db/load.py:41-50:
    ``execute_values`` over ``INSERT … ON CONFLICT (key) DO UPDATE``)
    against a REAL database — an in-process DuckDB file standing in for
    RDS, no network needed. Returns a ``page_writer`` for
    :class:`UpsertSink`.

    Faithful to the production JDBC shape in every part that matters:

    * runs executor-side inside ``foreachPartition`` — one connection per
      partition (the JDBC connection-per-task pattern), driver never
      sees rows;
    * rows applied in bounded pages via :func:`paged_writes` — per-
      statement memory/locks capped at ``page_size``;
    * the upsert is VERSION-AWARE: ``DO UPDATE … WHERE (excluded.v…) >
      (t.v…)`` so an out-of-order older row can never overwrite a newer
      one — the same global-last-wins contract as the TableGroup merge;
    * write-write conflicts between concurrent partition transactions
      (DuckDB's optimistic concurrency; serialization failures in
      Postgres) are retried with backoff — the reference's transient-
      error taxonomy (SURVEY §2.10) applied at the statement level.
    """
    set_clause = ", ".join(f"{c} = excluded.{c}" for c in cols
                           if c not in keys)
    vers_new = ", ".join(f"excluded.{c}" for c in version_cols)
    vers_old = ", ".join(f"{table}.{c}" for c in version_cols)
    sql = (f"INSERT INTO {table} ({', '.join(cols)}) "
           f"VALUES ({', '.join('?' for _ in cols)}) "
           f"ON CONFLICT ({', '.join(keys)}) DO UPDATE SET {set_clause} "
           f"WHERE ({vers_new}) > ({vers_old})")

    def per_partition(rows: Iterator[Any]) -> None:
        import random
        import time

        import duckdb
        con = duckdb.connect(db_path)
        try:
            def execute_page(page: list[Any]) -> None:
                vals = [[r[c] for c in cols] for r in page]
                for attempt in range(max_attempts):
                    try:
                        con.executemany(sql, vals)
                        return
                    except duckdb.Error as e:
                        transient = "conflict" in str(e).lower()
                        if not transient or attempt == max_attempts - 1:
                            raise
                        time.sleep(0.05 * (2 ** attempt)
                                   * (0.5 + random.random()))
            paged_writes(rows, page_size, execute_page)
        finally:
            con.close()

    def writer(df: DataFrame) -> None:
        # bounded connection parallelism — see duckdb_changelog_writer
        df.coalesce(n_connections).foreachPartition(per_partition)

    return writer


def duckdb_changelog_writer(db_path: str, table: str, keys: list[str],
                            cols: list[str], version_col: str,
                            page_size: int = 500, max_attempts: int = 8,
                            n_connections: int = 4) -> Callable[[DataFrame], None]:
    """Apply a FORMAL CHANGELOG (op ∈ +I/+U/-U/-D with versions — the
    output contract of ``stateful.retract_maintain``) to a real keyed
    database table, out-of-order- and redelivery-safe (ROADMAP
    "changelog consumers" item):

    * ``+I``/``+U`` — version-gated upsert (an older row can never
      overwrite a newer one; equal version = idempotent no-op);
    * ``-D`` — a TOMBSTONE upsert (``_deleted=true``) rather than a SQL
      DELETE: a physical delete would resurrect if an out-of-order
      older ``+U`` arrived after it, the classic CDC-apply bug; the
      tombstone competes on version like any row (the Kafka-compaction /
      Debezium sink recipe). Readers filter ``_deleted``.
    * ``-U`` (update-before) — skipped: a keyed table needs only the
      after-image; the before-image exists for aggregating consumers
      (see test_stateful_streaming's changelog-summing test).

    Same transport shape as :func:`duckdb_upsert_writer`: executor-side
    connection per partition, bounded pages, driver never sees rows."""
    data_cols = [c for c in cols if c not in keys and c != version_col]
    all_cols = [*keys, *data_cols, version_col, "_deleted"]
    set_clause = ", ".join(f"{c} = excluded.{c}"
                           for c in [*data_cols, version_col, "_deleted"])
    sql = (f"INSERT INTO {table} ({', '.join(all_cols)}) "
           f"VALUES ({', '.join('?' for _ in all_cols)}) "
           f"ON CONFLICT ({', '.join(keys)}) DO UPDATE SET {set_clause} "
           f"WHERE excluded.{version_col} > {table}.{version_col}")

    def per_partition(rows: Iterator[Any]) -> None:
        import random
        import time

        import duckdb

        # file-lock and write-write conflicts between concurrent
        # partition workers are transient — same retry taxonomy as
        # duckdb_upsert_writer (a real JDBC target serializes in the
        # server instead)
        def attempt(fn):
            for a in range(max_attempts):
                try:
                    return fn()
                except duckdb.Error as e:
                    if "conflict" not in str(e).lower() or a == max_attempts - 1:
                        raise
                    time.sleep(0.05 * (2 ** a) * (0.5 + random.random()))

        con = attempt(lambda: duckdb.connect(db_path))
        try:
            def execute_page(page: list[Any]) -> None:
                vals = []
                for r in page:
                    if r["op"] == "-U":
                        continue
                    vals.append([*(r[c] for c in keys),
                                 *(r[c] for c in data_cols),
                                 r[version_col], r["op"] == "-D"])
                if vals:
                    attempt(lambda: con.executemany(sql, vals))
            paged_writes(rows, page_size, execute_page)
        finally:
            con.close()

    def writer(df: DataFrame) -> None:
        # cap concurrent connections: a changelog batch is usually far
        # smaller than the session's partition count, and a single-file
        # DuckDB target (like a real JDBC pool) serves bounded writers —
        # uncapped, 32 workers contend on the file lock and can exhaust
        # the retry budget under machine load (observed as suite-order
        # flakiness before this cap)
        df.coalesce(n_connections).foreachPartition(per_partition)

    return writer


class UpsertSink:
    """Idempotent keyed-upsert sink over a TableGroup table.

    Use as ``stream.writeStream.foreachBatch(sink).start()``. State
    machine per micro-batch: fence (ledger) → dedup (in-batch last-wins)
    → merge (version-aware keyed upsert) → atomic commit (data + ledger
    together).
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
        # version-aware merge: target rows COMPETE with updates on
        # version_cols instead of always losing (merge_upsert's Postgres
        # all-columns-overwrite would make the table batch-order-wins
        # across micro-batches — wrong under out-of-order redelivery).
        # One union + one keyed window shuffle; at 100 TB the window
        # shuffles on the merge key exactly like the join rewrite would.
        merged = last_wins(
            target.unionByName(deduped.select(*target.columns)),
            keys=self.keys,
            version=[F.col(c) for c in self.version_cols])
        if self.page_writer is not None:
            self.page_writer(deduped)  # mirror to the JDBC-shaped target
        self.group.publish({self.table: merged},
                           meta={f"last_batch:{self.table}": int(batch_id)})
        self.applied += 1
