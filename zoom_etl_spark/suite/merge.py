"""Merge/upsert queries — the reference's hard core (SURVEY.md §2.4 J3,
§2.1 S13, §3.3): ON CONFLICT upserts re-expressed as join-merges, and the
staging→final reconciliation composite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.merge import merge_upsert, staging_merge
from ..operators.windows import last_wins
from ..registry import query

_CUTOFF = "2024-01-15 00:00:00"


def _snapshot(e: DataFrame, cond) -> DataFrame:
    """Last-wins state per user for the events matching ``cond`` — the
    'table state' produced by replaying that slice as upserts."""
    return (last_wins(e.filter(cond), keys=["user_id"],
                      version=[F.col("ts"), F.col("event_id")])
            .select("user_id", "event_id", "event_type", "value"))


@query("merge_upsert", oracle=f"""
SELECT user_id, event_id, event_type, round(value, 3) AS val FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""")
def merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-columns-overwrite upsert via full-outer-join merge (ref
    load.py:77-92). Target = per-user state before the cutoff; updates =
    per-user state after. Merging must equal the last-wins state over the
    whole table — which is the oracle."""
    e = table(spark, sf_dir, "events")
    target = _snapshot(e, F.col("ts") < F.lit(_CUTOFF).cast("timestamp"))
    updates = _snapshot(e, F.col("ts") >= F.lit(_CUTOFF).cast("timestamp"))
    merged = merge_upsert(target, updates, keys=["user_id"])
    return merged.select("user_id", "event_id", "event_type",
                         F.round("value", 3).alias("val"))


@query("upsert_last_wins", oracle="""
SELECT user_id, event_id AS last_event, event_type AS last_type FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""")
def upsert_last_wins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent-replay upsert stream (ref utils.py:147-167 staging upsert;
    SURVEY ST4): three chronological batches applied as successive merges
    — final state must equal single-pass last-wins (the oracle). Each
    batch is deduped in-batch first, as foreachBatch sinks must."""
    e = table(spark, sf_dir, "events")
    cuts = ["2024-01-10 00:00:00", "2024-01-20 00:00:00"]
    c0, c1 = (F.lit(c).cast("timestamp") for c in cuts)
    batches = [
        e.filter(F.col("ts") < c0),
        e.filter((F.col("ts") >= c0) & (F.col("ts") < c1)),
        e.filter(F.col("ts") >= c1),
    ]
    state = None
    for b in batches:
        batch_state = _snapshot(b, F.lit(True))
        state = batch_state if state is None else merge_upsert(state, batch_state,
                                                               keys=["user_id"])
    return state.select("user_id", F.col("event_id").alias("last_event"),
                        F.col("event_type").alias("last_type"))


@query("cdc_diff", oracle="""
WITH old_state AS (
  SELECT user_id, event_id, event_type FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1
),
new_state AS (
  SELECT user_id, event_id, event_type FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
)
SELECT coalesce(n.user_id, o.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            WHEN o.event_id = n.event_id AND o.event_type = n.event_type THEN 'unchanged'
            ELSE 'update' END AS change,
       n.event_id AS new_event_id,
       o.event_id AS old_event_id
FROM old_state o FULL OUTER JOIN new_state n ON o.user_id = n.user_id
""")
def cdc_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between two snapshots: per-user state before the cutoff
    vs final state — inserts (users first seen after), updates (newer
    last event), unchanged (no later events). The CDC primitive for
    current-state-only sources like the reference's warehouse."""
    from ..operators.merge import snapshot_diff
    e = table(spark, sf_dir, "events")
    old = _snapshot(e, F.col("ts") < F.lit(_CUTOFF).cast("timestamp")) \
        .select("user_id", "event_id", "event_type")
    new = _snapshot(e, F.lit(True)).select("user_id", "event_id", "event_type")
    d = snapshot_diff(old, new, keys=["user_id"],
                      compare_cols=["event_id", "event_type"])
    return d.select("user_id", "change",
                    F.col("new_event_id"), F.col("old_event_id"))


@query("staging_merge", oracle="""
WITH staging AS (
  SELECT l_orderkey AS order_id, l_linenumber AS line_no,
         round(l_extendedprice, 2) AS price
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
),
parent AS (
  SELECT DISTINCT o_orderkey AS order_id FROM orders
  WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
)
SELECT 'merged' AS state, s.order_id, s.line_no, s.price
FROM staging s WHERE EXISTS (SELECT 1 FROM parent p WHERE p.order_id = s.order_id)
UNION ALL
SELECT 'retained' AS state, s.order_id, s.line_no, s.price
FROM staging s WHERE NOT EXISTS (SELECT 1 FROM parent p WHERE p.order_id = s.order_id)
""")
def staging_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one real multi-operator SQL query (load.py:193-235):
    staging rows merge into the final table only if their FK parent
    exists; orphans wait in staging for a later run (late-data holding
    pen). Output tags each staging row with its disposition."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")

    staging = (l.filter(F.col("l_shipdate") >= cutoff)
               .select(F.col("l_orderkey").alias("order_id"),
                       F.col("l_linenumber").alias("line_no"),
                       F.round("l_extendedprice", 2).alias("price")))
    parent = o.filter(F.col("o_orderdate") < cutoff)
    empty_target = spark.createDataFrame([], staging.schema)

    new_target, retained = staging_merge(
        staging, parent, empty_target,
        staging_parent_key="order_id", parent_key="o_orderkey",
        merge_keys=["order_id", "line_no"])
    merged_tagged = new_target.select(F.lit("merged").alias("state"), "*")
    retained_tagged = retained.select(F.lit("retained").alias("state"), "*")
    return merged_tagged.unionByName(retained_tagged)


@query("merge_three_clause", oracle="""
WITH upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 1.0 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 < 3
),
ins AS (
  SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 0
),
kept AS (
  SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
         CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
              ELSE t.o_totalprice END AS o_totalprice,
         t.o_orderdate, t.o_orderpriority
  FROM orders t LEFT JOIN upd u USING (o_orderkey)
  WHERE NOT (u.o_orderkey IS NOT NULL AND t.o_orderstatus = 'F')
)
SELECT * FROM kept UNION ALL SELECT * FROM ins
""")
def merge_three_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full three-clause MERGE INTO (operators/merge.py::merge_into):
    WHEN MATCHED AND status='F' THEN DELETE (first clause wins — a
    finished order touched by a change feed is retired), WHEN MATCHED
    THEN UPDATE SET price = s.price (repricing; the delta is an exact
    float add — a ×1.1-then-round variant tripped the one-ulp
    HALF_UP-vs-nearest divergence between engines on ~1/10k rows), WHEN NOT MATCHED THEN
    INSERT (new orders). The oracle restates the clause algebra as
    left-join CASE logic; the engine plan is ONE key-keyed full-outer
    join with the clause cascade as a codegen'd CASE over row structs,
    plus the Delta-style multi-match runtime guard riding the same
    shuffle. Generalizes the reference's ON CONFLICT upsert
    (src/db/load.py:77-92) to the standard's full clause set."""
    from ..operators.merge import merge_into
    o = table(spark, sf_dir, "orders")
    upd = (o.filter(F.col("o_orderkey") % 10 < 3)
           .withColumn("o_totalprice", F.col("o_totalprice") + 1.0))
    ins = (o.filter(F.col("o_orderkey") % 100 == 0)
           .withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000_000))
    src = upd.unionByName(ins)
    return merge_into(
        o, src, ["o_orderkey"],
        matched=[
            ("delete", F.col("t.o_orderstatus") == "F", None),
            ("update", None, {"o_totalprice": F.col("s.o_totalprice")}),
        ],
        not_matched_insert=True)
