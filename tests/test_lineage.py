"""Column-lineage extraction gates: each supported plan shape resolves
its output columns to exactly the base-relation columns that feed them.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from zoom_etl_spark.catalog import table
from zoom_etl_spark.lineage import column_lineage


def _by_col(lin):
    """{output col: {(basename-of-source, col)}} for readable asserts."""
    return {k: {(src.rstrip("/").split("/")[-1], col) for src, col in v}
            for k, v in lin.items()}


def test_lineage_join_aggregate(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    df = (c.join(n, c.c_nationkey == n.n_nationkey)
           .groupBy("n_name")
           .agg(F.sum("c_acctbal").alias("total"),
                F.count("*").alias("cnt")))
    lin = _by_col(column_lineage(df))
    assert lin["n_name"] == {("nation.parquet", "n_name")}
    assert lin["total"] == {("customer.parquet", "c_acctbal")}
    assert lin["cnt"] == set()  # count(*) reads no column


def test_lineage_derived_expression_merges_sources(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    df = li.select(
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue"),
        F.col("l_orderkey").alias("okey"))
    lin = _by_col(column_lineage(df))
    assert lin["revenue"] == {("lineitem.parquet", "l_extendedprice"),
                              ("lineitem.parquet", "l_discount")}
    assert lin["okey"] == {("lineitem.parquet", "l_orderkey")}


def test_lineage_through_window_and_chain(spark, sf_dir):
    from pyspark.sql.window import Window
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    step1 = o.select("o_custkey", "o_orderdate", "o_totalprice")
    step2 = step1.withColumn("rank", F.row_number().over(w))
    df = step2.select("rank", (F.col("o_totalprice") * 2).alias("dbl"))
    lin = _by_col(column_lineage(df))
    # row_number depends on the window's partition/order columns
    assert lin["rank"] == {("orders.parquet", "o_custkey"),
                           ("orders.parquet", "o_orderdate")}
    assert lin["dbl"] == {("orders.parquet", "o_totalprice")}


def test_lineage_literal_has_no_sources(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    df = c.select(F.lit(1).alias("one"), F.col("c_name"))
    lin = _by_col(column_lineage(df))
    assert lin["one"] == set()
    assert lin["c_name"] == {("customer.parquet", "c_name")}


def test_lineage_flagship_query(spark):
    """The flagship plan (scan→join→agg→window→topk) resolves every
    output column to plausible base columns — the end-to-end shape."""
    from zoom_etl_spark import plans
    df = plans.flagship(spark, "/root/testdata/sf0.001")
    lin = _by_col(column_lineage(df))
    assert lin, "no output columns resolved"
    # every output column resolves, and at least one traces to a join
    # of customer-side and orders/lineitem-side columns
    tables = {t for srcs in lin.values() for t, _ in srcs}
    assert any(t.startswith("lineitem") or t.startswith("orders")
               for t in tables), tables


def test_lineage_union_traces_all_branches(spark, sf_dir):
    """Round-5 verdict item 7: unionByName output columns resolve the
    base columns of EVERY branch, not just the first child whose
    exprIds the Union output reuses."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    left = c.select(F.col("c_name").alias("name"),
                    F.col("c_acctbal").alias("bal"))
    right = s.select(F.col("s_name").alias("name"),
                     F.col("s_acctbal").alias("bal"))
    lin = _by_col(column_lineage(left.unionByName(right)))
    assert lin["name"] == {("customer.parquet", "c_name"),
                           ("supplier.parquet", "s_name")}
    assert lin["bal"] == {("customer.parquet", "c_acctbal"),
                          ("supplier.parquet", "s_acctbal")}


def test_lineage_union_then_aggregate(spark, sf_dir):
    """Union feeding an aggregate (the S3/S6 multi-status-scan shape):
    grouped output still merges both branches' sources."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    u = (c.select(F.col("c_nationkey").alias("nk"),
                  F.col("c_acctbal").alias("bal"))
          .unionByName(s.select(F.col("s_nationkey").alias("nk"),
                                F.col("s_acctbal").alias("bal"))))
    df = u.groupBy("nk").agg(F.sum("bal").alias("total"))
    lin = _by_col(column_lineage(df))
    assert lin["nk"] == {("customer.parquet", "c_nationkey"),
                         ("supplier.parquet", "s_nationkey")}
    assert lin["total"] == {("customer.parquet", "c_acctbal"),
                            ("supplier.parquet", "s_acctbal")}
