"""Bucketed co-located joins must plan with no Exchange (the 100 TB
fact-fact join strategy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zoom_etl_spark.catalog import table
from zoom_etl_spark.operators.bucketing import colocated_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    o = table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "k")
    l = table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "k")
    write_bucketed(o.select("k", "o_totalprice"), "b_orders", "k", 8)
    write_bucketed(l.select("k", "l_quantity"), "b_lineitem", "k", 8)

    joined = colocated_join(spark, "b_orders", "b_lineitem", "k", force_merge=True)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan[:800]  # no shuffle

    # same sort-merge join on the raw (unbucketed) frames shuffles both sides
    raw = (o.select("k", "o_totalprice").hint("merge")
           .join(l.select("k", "l_quantity"), "k"))
    raw_plan = raw._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in raw_plan

    # and of course the co-located join is still correct
    assert joined.count() == raw.count()
