"""Wide scalar-function coverage (SURVEY §2.3 family, broadened): string,
math, date-part, and conditional functions a warehouse user expects —
each oracle-checked so the engine's function surface is pinned to ANSI
semantics, not just present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query("string_funcs_wide", oracle="""
SELECT c_custkey AS id,
       upper(c_name) AS up,
       lower(c_mktsegment) AS lo,
       length(c_name) AS len,
       substring(c_name, 1, 8) AS pre,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
       replace(c_name, 'Customer', 'Cust') AS repl,
       reverse(c_mktsegment) AS rev,
       trim(concat('  ', c_name, '  ')) AS trimmed,
       left(c_name, 4) AS l4,
       right(c_name, 4) AS r4,
       contains(c_name, '#00') AS has_zero,
       starts_with(c_name, 'Customer') AS is_cust,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS lowered_vowels
FROM customer
""")
def string_funcs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function sweep, one pass, all codegen."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").alias("len"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
        F.reverse("c_mktsegment").alias("rev"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.substring("c_name", 1, 4).alias("l4"),
        F.col("c_name").substr(F.length("c_name") - 3, F.lit(4)).alias("r4"),
        F.contains(F.col("c_name"), F.lit("#00")).alias("has_zero"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("is_cust"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("lowered_vowels"),
    )


@query("math_funcs_wide", oracle="""
SELECT o_orderkey AS id,
       round(abs(o_totalprice - 100000.0), 2) AS dist,
       CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS ceil_k,
       CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS floor_k,
       round(sqrt(o_totalprice), 4) AS sq,
       round(ln(o_totalprice), 6) AS logn,
       round(log10(o_totalprice), 6) AS log_ten,
       round(pow(o_totalprice, 0.5) - sqrt(o_totalprice), 6) AS pow_diff,
       CAST(o_orderkey % 7 AS BIGINT) AS mod7,
       CAST(sign(o_totalprice - 150000.0) AS DOUBLE) AS sgn,
       greatest(o_totalprice, 150000.0) AS hi,
       least(o_totalprice, 150000.0) AS lo
FROM orders
""")
def math_funcs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function sweep (abs/ceil/floor/sqrt/ln/log10/pow/mod/sign)."""
    o = table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        F.col("o_orderkey").alias("id"),
        F.round(F.abs(tp - 100000.0), 2).alias("dist"),
        F.ceil(tp / 1000.0).alias("ceil_k"),
        F.floor(tp / 1000.0).alias("floor_k"),
        F.round(F.sqrt(tp), 4).alias("sq"),
        F.round(F.log(tp), 6).alias("logn"),
        F.round(F.log10(tp), 6).alias("log_ten"),
        F.round(F.pow(tp, F.lit(0.5)) - F.sqrt(tp), 6).alias("pow_diff"),
        (F.col("o_orderkey") % 7).alias("mod7"),
        F.signum(tp - 150000.0).alias("sgn"),
        F.greatest(tp, F.lit(150000.0)).alias("hi"),
        F.least(tp, F.lit(150000.0)).alias("lo"),
    )


@query("date_funcs_wide", oracle="""
SELECT o_orderkey AS id,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dy,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
""")
def date_funcs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part/arithmetic sweep (year/month/day/quarter, interval math,
    trunc, last_day, formatting)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").alias("id"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.quarter(d).alias("qtr"),
        (d + F.expr("interval 90 days")).alias("due"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@query("try_funcs", oracle="""
SELECT o_orderkey AS id,
       round(o_totalprice / ((o_orderkey % 5) * 2 + 1), 4) AS odd_div,
       CASE WHEN (o_orderkey % 3) = 1 THEN NULL
            ELSE o_totalprice / ((o_orderkey % 3) - 1) END AS div_or_null,
       TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS good_cast
FROM orders
""")
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe try_* family: Spark 4 runs ANSI mode (divide-by-zero and
    bad casts THROW) — production pipelines use try_divide/try_cast for
    NULL-on-failure, the reference loader's error regime (SURVEY §7.3,
    generalized). Divisors are kept ODD in the rounded column: an even
    divisor of 2-decimal prices can land exactly on the 5th-decimal
    rounding boundary, where Spark (HALF_UP) and DuckDB (half-even)
    legitimately disagree."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("id"),
        F.round(F.try_divide("o_totalprice", (F.col("o_orderkey") % 5) * 2 + 1), 4)
         .alias("odd_div"),
        F.try_divide("o_totalprice", (F.col("o_orderkey") % 3) - 1)
         .alias("div_or_null"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("good_cast"))


@query("conditional_funcs", oracle="""
SELECT o_orderkey AS id,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS bucket,
       coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_or_pending,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN TRUE ELSE FALSE END AS urgent,
       ifnull(NULL, o_orderstatus) AS never_null
FROM orders
""")
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/IN conditional sweep."""
    o = table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        F.col("o_orderkey").alias("id"),
        F.when(tp > 200000, "high").when(tp > 100000, "mid")
         .otherwise("low").alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")),
                   F.lit("pending")).alias("status_or_pending"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("urgent"),
        F.coalesce(F.lit(None).cast("string"),
                   F.col("o_orderstatus")).alias("never_null"),
    )


@query("map_funcs_wide", oracle="""
SELECT event_id,
       3 AS n_keys,
       'k,type,uid' AS keys,
       array_to_string(list_sort([upper(event_type),
                                  CAST(user_id AS VARCHAR),
                                  json_extract_string(props, '$.k')]), ',')
         AS vals_upper,
       array_to_string(list_sort(['k=' || json_extract_string(props, '$.k'),
                                  'type=' || event_type,
                                  'x=1']), ',') AS filtered_plus
FROM events
""")
def map_funcs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed function sweep (completing the scalar surface next to
    the array/string/date/regexp sweeps): create_map, map_keys,
    map_values, transform_values, map_filter, map_concat, map_entries —
    the nested-data ops a props/attributes column needs. Outputs are
    normalized to sorted joined strings because map iteration order is
    undefined in BOTH engines — the oracle states the semantic content,
    the Spark side exercises the real map operators. Row-local
    expressions only: zero shuffle at any scale."""
    e = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
        F.lit("k"), F.get_json_object("props", "$.k"))
    m_upper = F.transform_values(m, lambda k, v: F.upper(v))
    m_filt = F.map_filter(m, lambda k, v: k != F.lit("uid"))
    m_plus = F.map_concat(m_filt, F.create_map(F.lit("x"), F.lit("1")))
    ent = F.transform(F.map_entries(m_plus),
                      lambda e_: F.concat(e_.key, F.lit("="), e_.value))
    return e.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
        F.array_join(F.array_sort(F.map_values(m_upper)), ",")
        .alias("vals_upper"),
        F.array_join(F.array_sort(ent), ",").alias("filtered_plus"))
