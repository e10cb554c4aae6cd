"""Native column-expression operators vs their Arrow/pandas twins must
agree exactly (SURVEY §2.11 dual-implementation contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zoom_etl_spark.catalog import table
from zoom_etl_spark.functions.pandas_parity import (preference_top1_pandas,
                                                    sanitize_name_pandas,
                                                    token_stats_mapinpandas,
                                                    zscore_native,
                                                    zscore_pandas)
from zoom_etl_spark.functions.text import sanitize_name
from zoom_etl_spark.operators.windows import topk_per_group

from .fixtures import dirty_topics, preferences, recording_files


def test_sanitize_parity(spark):
    d = dirty_topics(spark)
    both = d.select(
        sanitize_name("topic").alias("native"),
        sanitize_name_pandas("topic").alias("arrow"))
    assert all(r.native == r.arrow for r in both.collect())


def test_preference_select_parity(spark):
    files, prefs = recording_files(spark), preferences(spark)
    joined = files.join(F.broadcast(prefs), "recording_type")
    native = topk_per_group(joined, keys=["meeting_uuid", "category"],
                            order=[F.col("priority").asc(), F.col("id").desc()], k=1)
    arrow = preference_top1_pandas(files, prefs, ["meeting_uuid", "category"])
    key = lambda df: {tuple(sorted(r.asDict().items())) for r in df.collect()}
    assert key(native) == key(arrow)


def test_zscore_parity(spark, sf_dir):
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    native = {r.event_id: round(r.zscore, 9)
              for r in zscore_native(e, "user_id", "value").collect()}
    arrow = {r.event_id: round(r.zscore, 9)
             for r in zscore_pandas(e, "user_id", "value").collect()}
    assert native == arrow


def test_token_stats_mapinpandas_matches_native(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    native = {r.doc_id: r.n for r in d.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n")).collect()}
    arrow = {r.doc_id: r.n_tokens
             for r in token_stats_mapinpandas(d, "doc_id", "text").collect()}
    assert native == arrow
