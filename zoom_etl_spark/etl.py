"""The reference's batch ETL DAG as ONE lazy Spark program (SURVEY §3.1).

The Airflow DAG (reference airflow/dags/etl_process.py:35-238) hand-
schedules: fan-out over users → per-user meeting fetch → flatten →
re-chunk → detail/participant fetch → projected loads → watermark
advance. Here the whole graph is a single DataFrame composition:

  * task fan-out/chunking        → source partitioning (the REST
                                   DataSource partitions the key space)
  * XCom list-of-dicts exchange  → in-plan columnar exchange
  * flatten + re-chunk (§3.1#3)  → just the plan's natural shuffle
  * inter-task ordering (#5)     → dataflow dependency (parents merge
                                   before children via staging_merge)
  * watermark-after-success (#6) → streaming.incremental.run_incremental

Catalyst replaces the missing optimizer; AQE replaces manual chunk-size
tuning. Sources here are the synthetic REST stand-ins (no network); the
pipeline topology is the real deliverable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.merge import merge_upsert, staging_merge
from .operators.txn import TableGroup
from .operators.windows import last_wins
from .sources import rest


def extract_users(spark: SparkSession, n_keys: int = 24,
                  n_partitions: int = 8) -> DataFrame:
    """S1/S3: paginated key-partitioned extraction + early dedup (A1:
    dedup BEFORE the expensive per-key fan-out, extract.py:68)."""
    rest.register(spark)
    raw = (spark.read.format("paginated_rest")
           .option("nkeys", str(n_keys))
           .option("numpartitions", str(n_partitions)).load())
    users = raw.select(
        F.col("key").alias("user_key"),
        F.split("payload", "-").getItem(1).cast("long").alias("user_id"),
        F.col("payload").alias("user_payload"))
    return users.dropDuplicates(["user_key"])


def extract_meetings(users: DataFrame) -> DataFrame:
    """S5/S7: per-user child-collection expansion (each user yields
    user_key%4+1 'meetings'), the explode that replaces per-chunk task
    mapping."""
    meetings = users.select(
        "user_key",
        F.explode(F.sequence(F.lit(0), F.pmod("user_key", F.lit(4)))).alias("m"))
    return meetings.select(
        "user_key",
        F.concat_ws("-", F.lit("mtg"), "user_key", "m").alias("meeting_uuid"),
        (F.col("user_key") * 10 + F.col("m")).alias("duration"))


def run_batch_etl(spark: SparkSession, user_target: str, meeting_target: str,
                  n_keys: int = 24) -> dict:
    """One DAG run: extract → project → load (merge) in FK order.
    Idempotent: re-running with the same source state changes nothing
    (every load is a keyed merge). Returns row counts."""
    users = extract_users(spark, n_keys)
    meetings = extract_meetings(users)

    def load(target_dir: str, df: DataFrame, keys: list[str]) -> int:
        try:
            old = spark.read.parquet(target_dir)
        except Exception:
            old = spark.createDataFrame([], df.schema)
        merged = merge_upsert(old, df, keys=keys).localCheckpoint()
        merged.write.mode("overwrite").parquet(target_dir)
        return merged.count()

    # FK parent first (users), then children — the DAG's ordering edge
    n_users = load(user_target, users, keys=["user_key"])
    n_meetings = load(meeting_target,
                      last_wins(meetings, keys=["meeting_uuid"],
                                version=[F.col("duration")]),
                      keys=["meeting_uuid"])
    return {"users": n_users, "meetings": n_meetings}


def reconcile_staging(spark: SparkSession, group: TableGroup,
                      staging_parent_key: str, parent_key: str,
                      merge_keys: list[str],
                      staging: str = "staging", target: str = "target",
                      parent: str = "parent") -> dict:
    """The reference's transactional staging→final reconciliation
    (src/db/load.py:193-235): merge parent-gated staging rows into the
    target, retain orphans for a later run — and, like the reference's
    single DB transaction (:230-234), publish BOTH resulting tables with
    one atomic commit. A crash anywhere before the pointer swap leaves
    the previous (consistent) version of target AND staging visible;
    there is no state in which the merge landed but staging still holds
    the merged rows (the double-apply / torn-read hazard the reference's
    rollback at :44-50 exists to prevent).

    Both outputs stem from one staging scan; the merge itself is
    idempotent (keyed upsert), so a retry after a crash converges.
    """
    new_target, retained = staging_merge(
        group.read(spark, staging), group.read(spark, parent),
        group.read(spark, target),
        staging_parent_key=staging_parent_key, parent_key=parent_key,
        merge_keys=merge_keys)
    version = group.publish({target: new_target, staging: retained})
    return {"version": version,
            "target_rows": group.read(spark, target).count(),
            "retained_rows": group.read(spark, staging).count()}
