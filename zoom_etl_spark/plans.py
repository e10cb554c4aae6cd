"""Flagship end-to-end plan (SURVEY.md §7.1): the spine of the engine in
one query — scan → broadcast-dim joins → hash aggregate → window top-k →
ordered take.

"Revenue-weighted activity per group with dedup and top-k": revenue per
(region, nation) from orders⋈customer⋈nation⋈region, then the top-3
nations per region by revenue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import table
from .operators.windows import topk_per_group


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    per_nation = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    top = topk_per_group(per_nation, keys=["region"],
                         order=[F.col("revenue").desc(), F.col("nation").asc()],
                         k=3, keep_rank=True, rank_col="rank")
    return top.orderBy("region", "rank")


FLAGSHIP_ORACLE = """
SELECT region, nation, n_orders, revenue, rank FROM (
  SELECT r.r_name AS region, n.n_name AS nation,
         count(*) AS n_orders,
         round(sum(o.o_totalprice), 2) AS revenue,
         row_number() OVER (PARTITION BY r.r_name
                            ORDER BY round(sum(o.o_totalprice), 2) DESC, n.n_name ASC) AS rank
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
) WHERE rank <= 3
"""
