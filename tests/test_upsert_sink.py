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


def test_sink_out_of_order_batches_keep_global_last_wins(spark, sf_dir):
    """The cross-batch contract (round-2 ADVICE): with a multi-batch
    source delivering NEWEST events first, a later batch's older event
    must NOT overwrite the newer target row. The version-aware merge
    makes the converged table global last-wins, identical to the
    single-batch run."""
    from .fixtures import ooo_events_stream

    group, sink = _fresh_sink(spark)
    stream = ooo_events_stream(spark, sf_dir).select(*COLS)
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", tempfile.mkdtemp(prefix="zes_ck_"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert sink.applied >= 3  # genuinely multi-batch

    got = {tuple(r) for r in group.read(spark, "t").collect()}
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    w = (e.withColumn("rn", F.row_number().over(
            Window.partitionBy("user_id")
            .orderBy(F.desc("ts"), F.desc("event_id"))))
         .filter("rn = 1").select(*COLS))
    assert got == {tuple(r) for r in w.collect()}


def _duck_target(tmpdir):
    import duckdb
    db = f"{tmpdir}/rds.duckdb"
    con = duckdb.connect(db)
    con.execute("""CREATE TABLE events_current (
        user_id BIGINT PRIMARY KEY, event_id BIGINT, event_type VARCHAR,
        ts TIMESTAMP, value DOUBLE)""")
    con.close()
    return db


def test_duckdb_jdbc_seam_paged_upserts_land(spark, sf_dir):
    """VERDICT item 4: the JDBC transport half against a REAL database —
    paged INSERT…ON CONFLICT into a file-backed DuckDB table. Converged
    DB state must equal the TableGroup table AND batch last-wins."""
    import duckdb

    from zoom_etl_spark.streaming.sink import duckdb_upsert_writer

    tmpdir = tempfile.mkdtemp(prefix="zes_duck_")
    db = _duck_target(tmpdir)
    writer = duckdb_upsert_writer(
        db, "events_current", keys=["user_id"], cols=COLS,
        version_cols=["ts", "event_id"], page_size=64)
    group = TableGroup(tempfile.mkdtemp(prefix="zes_sinktest_"))
    group.publish({"t": spark.createDataFrame(
        [], "user_id long, event_id long, event_type string, "
            "ts timestamp, value double")})
    sink = UpsertSink(group, "t", keys=["user_id"],
                      version_cols=["ts", "event_id"], page_writer=writer)
    _run(spark, sf_dir, sink)

    con = duckdb.connect(db)
    got_db = {tuple(r) for r in
              con.execute(f"SELECT {', '.join(COLS)} "
                          "FROM events_current").fetchall()}
    got_grp = {tuple(r) for r in group.read(spark, "t").collect()}
    assert got_db == got_grp and len(got_db) > 0

    # redelivered batches are a no-op at the DB too (ledger fences the
    # whole sink body, page_writer included)
    batch = table(spark, sf_dir, "events").select(*COLS)
    for replayed_id in range(sink.last_batch() + 1):
        sink(batch, replayed_id)
    after = {tuple(r) for r in
             con.execute(f"SELECT {', '.join(COLS)} "
                         "FROM events_current").fetchall()}
    con.close()
    assert after == got_db


def test_duckdb_jdbc_seam_out_of_order_version_guard(spark, sf_dir):
    """The DO UPDATE … WHERE version guard: replaying OLDER events into a
    DB already holding newer rows must change nothing (the SQL-side half
    of global last-wins)."""
    import duckdb

    from zoom_etl_spark.streaming.sink import duckdb_upsert_writer

    tmpdir = tempfile.mkdtemp(prefix="zes_duck_")
    db = _duck_target(tmpdir)
    writer = duckdb_upsert_writer(
        db, "events_current", keys=["user_id"], cols=COLS,
        version_cols=["ts", "event_id"], page_size=32)

    e = table(spark, sf_dir, "events").select(*COLS)
    from pyspark.sql.window import Window
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    newest = e.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    oldest = e.withColumn("rn", F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id"))
    ).filter("rn = 1").drop("rn")

    writer(newest)                       # DB now holds the newest per key
    con = duckdb.connect(db)
    before = {tuple(r) for r in
              con.execute("SELECT * FROM events_current").fetchall()}
    con.close()
    writer(oldest)                       # older replay: must be a no-op
    con = duckdb.connect(db)
    after = {tuple(r) for r in
             con.execute("SELECT * FROM events_current").fetchall()}
    con.close()
    assert after == before and len(after) > 0


def test_changelog_writer_cdc_apply(spark, tmp_path):
    """duckdb_changelog_writer semantics: version-gated upserts,
    tombstoned deletes (no resurrection by out-of-order older rows),
    -U skipped, redelivery idempotent."""
    import duckdb

    from zoom_etl_spark.streaming.sink import duckdb_changelog_writer

    db = str(tmp_path / "cdc.db")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE agg (user_id BIGINT PRIMARY KEY, "
                "n_events BIGINT, value_sum DOUBLE, version BIGINT, "
                "_deleted BOOLEAN)")
    con.close()

    rows = [
        # key 1: versions arrive OUT OF ORDER — v2 must win
        (1, "+U", 5, 50.0, 2),
        (1, "+I", 1, 10.0, 1),
        (1, "-U", 1, 10.0, 1),          # update-before: ignored
        # key 2: inserted then deleted (tombstone v3), then an
        # out-of-order OLDER +U arrives — must NOT resurrect
        (2, "+I", 1, 1.0, 1),
        (2, "-D", 1, 1.0, 3),
        (2, "+U", 2, 2.0, 2),
        # key 3: plain insert
        (3, "+I", 7, 70.0, 1),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, op string, n_events long, value_sum double, "
              "version long")
    writer = duckdb_changelog_writer(
        db, "agg", keys=["user_id"],
        cols=["user_id", "n_events", "value_sum", "version"],
        version_col="version")
    writer(df)
    writer(df)  # redelivery of the whole changelog: idempotent

    con = duckdb.connect(db)
    live = dict((r[0], r[1:]) for r in con.execute(
        "SELECT user_id, n_events, value_sum, version FROM agg "
        "WHERE NOT _deleted ORDER BY user_id").fetchall())
    dead = [r[0] for r in con.execute(
        "SELECT user_id FROM agg WHERE _deleted").fetchall()]
    con.close()
    assert live == {1: (5, 50.0, 2), 3: (7, 70.0, 1)}
    assert dead == [2]


def test_changelog_writer_streaming_end_to_end(spark, sf_dir, tmp_path):
    """retract_maintain's changelog applied through the writer converges
    the DuckDB table to the batch aggregate — the full CDC pipeline:
    stateful changelog operator → foreachBatch → keyed store."""
    import duckdb

    from zoom_etl_spark.streaming.sink import duckdb_changelog_writer
    from zoom_etl_spark.streaming.stateful import retract_maintain

    db = str(tmp_path / "agg.db")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE agg (user_id BIGINT PRIMARY KEY, "
                "n_events BIGINT, value_sum DOUBLE, version BIGINT, "
                "_deleted BOOLEAN)")
    con.close()
    writer = duckdb_changelog_writer(
        db, "agg", keys=["user_id"],
        cols=["user_id", "n_events", "value_sum", "version"],
        version_col="version")

    log = retract_maintain(read_events_stream(spark, sf_dir))
    q = (log.writeStream.foreachBatch(lambda b, _i: writer(b))
         .outputMode("update")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="zes_clck_"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    con = duckdb.connect(db)
    got = {r[0]: (r[1], round(r[2], 6)) for r in con.execute(
        "SELECT user_id, n_events, value_sum FROM agg WHERE NOT _deleted"
    ).fetchall()}
    con.close()
    e = table(spark, sf_dir, "events")
    want = {r.user_id: (r.n, round(r.s, 6)) for r in
            e.groupBy("user_id").agg(F.count("*").alias("n"),
                                     F.sum("value").alias("s")).collect()}
    assert got == want


def test_sink_crash_restart_exactly_once(spark, sf_dir):
    """Crash-inject the WORST window: the sink commits a batch, then the
    process dies BEFORE Spark records stream progress. On restart from
    the same checkpoint Spark redelivers that batch — the ledger must
    fence it (no double-apply) and the remaining files must still flow:
    exactly-once end to end through a real failure/restart cycle."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql.window import Window

    from zoom_etl_spark.streaming.ingest import EVENTS_SCHEMA

    e = table(spark, sf_dir, "events").select(*COLS)
    srcdir = tempfile.mkdtemp(prefix="zes_restart_src_")
    thirds = F.ntile(3).over(Window.orderBy("ts"))
    raw = (e.withColumn("g", thirds)
           .withColumn("ts", F.unix_micros("ts") * 1000))
    for g in (1, 2, 3):
        (raw.filter(F.col("g") == g).drop("g")
         .coalesce(1).write.mode("overwrite").parquet(f"{srcdir}/f{g}"))

    def stream():
        return (spark.readStream.schema(EVENTS_SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true").parquet(srcdir)
                .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))

    group, sink = _fresh_sink(spark)
    ck = tempfile.mkdtemp(prefix="zes_restart_ck_")
    crashes = {"n": 0}

    def crashing(batch, bid):
        sink(batch, bid)          # commit lands (data + ledger, atomic)
        crashes["n"] += 1
        if crashes["n"] == 1:     # ...then the process "dies"
            raise RuntimeError("injected crash after commit")

    q = (stream().writeStream.foreachBatch(crashing)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    applied_before = sink.applied
    assert applied_before >= 1

    # restart from the SAME checkpoint, no crash this time
    q2 = (stream().writeStream.foreachBatch(sink)
          .option("checkpointLocation", ck)
          .trigger(availableNow=True).start())
    q2.awaitTermination()

    assert sink.skipped >= 1      # the redelivered batch was fenced
    got = {(r.user_id, r.event_id) for r in group.read(spark, "t").collect()}
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {(r.user_id, r.event_id) for r in
            e.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1").collect()}
    assert got == want
