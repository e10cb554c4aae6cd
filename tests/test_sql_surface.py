"""SQL-surface parity (SURVEY §7.0: operators exposed both as DataFrame
compositions and as plain Spark SQL over registered views). Representative
queries re-written in Spark SQL must equal their DataFrame twins."""

from __future__ import annotations

import pytest

from zoom_etl_spark.catalog import register_views
from zoom_etl_spark.registry import all_queries

_SPECS = all_queries()

# Spark-SQL text equivalents (Spark dialect; the registry oracles are
# DuckDB dialect and mostly — not always — valid Spark SQL too).
SQL_TWINS = {
    "agg_count": """
        SELECT o_orderstatus AS status, count(*) AS cnt
        FROM orders GROUP BY o_orderstatus""",
    "join_fk_enrich": """
        SELECT o.o_orderkey AS order_id, c.c_name AS customer,
               n.n_name AS nation, r.r_name AS region
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey""",
    "topk_per_group": """
        SELECT segment, custkey, balance FROM (
          SELECT c_mktsegment AS segment, c_custkey AS custkey,
                 round(c_acctbal, 2) AS balance,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          FROM customer) WHERE rn <= 3""",
    "dedup_last_wins": """
        SELECT user_id, event_type, event_id, round(value, 3) AS val FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1""",
    "window_tumbling": """
        SELECT window.start AS day, count(*) AS cnt,
               round(sum(value), 3) AS total
        FROM events GROUP BY window(ts, '1 day')""",
    "set_except": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""",
    "agg_rollup": """
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               count(*) AS cnt, round(sum(l_quantity), 1) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
}


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    register_views(spark, sf_dir)


@pytest.mark.parametrize("name", sorted(SQL_TWINS))
def test_sql_equals_dataframe(spark, sf_dir, name):
    # repr-sort: rollup subtotal rows contain NULLs, unsortable natively
    df_rows = sorted(repr(tuple(r)) for r in _SPECS[name].fn(spark, sf_dir).collect())
    sql_rows = sorted(repr(tuple(r)) for r in spark.sql(SQL_TWINS[name]).collect())
    assert df_rows == sql_rows
