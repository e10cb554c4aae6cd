"""foreachBatch upsert sink (streaming/sink.py): exactly-once under
redelivery, paged JDBC-shaped transport, converged state == batch."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from zoom_etl_spark.catalog import table
from zoom_etl_spark.operators.txn import TableGroup
from zoom_etl_spark.streaming.ingest import read_events_stream
from zoom_etl_spark.streaming.sink import UpsertSink, paged_writes

COLS = ["user_id", "event_id", "event_type", "ts", "value"]


def _fresh_sink(spark):
    group = TableGroup(tempfile.mkdtemp(prefix="zes_sinktest_"))
    group.publish({"t": spark.createDataFrame(
        [], "user_id long, event_id long, event_type string, "
            "ts timestamp, value double")})
    return group, UpsertSink(group, "t", keys=["user_id"],
                             version_cols=["ts", "event_id"])


def _run(spark, sf_dir, sink):
    stream = read_events_stream(spark, sf_dir).select(*COLS)
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", tempfile.mkdtemp(prefix="zes_ck_"))
         .trigger(availableNow=True).start())
    q.awaitTermination()


def test_sink_converges_to_batch_last_wins(spark, sf_dir):
    group, sink = _fresh_sink(spark)
    _run(spark, sf_dir, sink)
    got = {tuple(r) for r in group.read(spark, "t").collect()}
    e = table(spark, sf_dir, "events")
    w = (e.withColumn("rn", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))))
         .filter("rn = 1").select(*COLS))
    assert got == {tuple(r) for r in w.collect()}
    assert sink.applied >= 1 and sink.skipped == 0


def test_sink_redelivery_is_exactly_once(spark, sf_dir):
    """Redeliver every batch (same batch_id, as Spark does after a sink
    failure before progress commit): ledger fences it — zero state change,
    zero version change."""
    group, sink = _fresh_sink(spark)
    _run(spark, sf_dir, sink)
    version = group.current_version()
    state = {tuple(r) for r in group.read(spark, "t").collect()}

    batch = table(spark, sf_dir, "events").select(*COLS)
    for replayed_id in range(sink.last_batch() + 1):
        sink(batch, replayed_id)               # redelivery of applied ids
    assert sink.skipped >= 1
    assert group.current_version() == version  # not even a new commit
    assert {tuple(r) for r in group.read(spark, "t").collect()} == state

    # a genuinely NEW batch still applies (the fence is not a dead stop)
    nxt = sink.last_batch() + 1
    sink(batch.limit(0), nxt)
    assert sink.last_batch() == nxt


def test_paged_writes_bounds_page_size():
    pages: list[list[int]] = []
    n = paged_writes(iter(range(1007)), page_size=100, execute_page=pages.append)
    assert n == 11 and len(pages) == 11
    assert all(len(p) == 100 for p in pages[:-1]) and len(pages[-1]) == 7
    assert [x for p in pages for x in p] == list(range(1007))


def test_sink_page_writer_runs_executor_side(spark, sf_dir):
    """The JDBC-transport half: every partition's rows are applied in
    bounded pages, counted executor-side via an accumulator (driver never
    collects rows)."""
    acc = spark.sparkContext.accumulator(0)

    def fake_jdbc(df):
        def per_partition(rows):
            def execute_page(page):
                assert len(page) <= 64
                acc.add(len(page))
            paged_writes(rows, 64, execute_page)
        df.foreachPartition(per_partition)

    group, _ = _fresh_sink(spark)
    sink = UpsertSink(group, "t", keys=["user_id"],
                      version_cols=["ts", "event_id"], page_writer=fake_jdbc)
    _run(spark, sf_dir, sink)
    # the sink pages out the POST-dedup upsert rows (one per key), the
    # same rows the ON CONFLICT statement would receive
    n_keys = table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert acc.value == n_keys
