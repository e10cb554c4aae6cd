"""Projections, filters, scalar functions, set ops, array/JSON ops.

Spark-first re-expressions of the reference's dataflow transforms
(SURVEY.md §2.2, §2.3, §2.7, §2.8): the dict→tuple projections of the
loader (reference src/db/load.py:96-190), the webhook validation filter
(handler.py:46-52), the scalar string/date helpers (utils.py:62-110,
extract.py:98-104,157-158, oauth.py:24-26), the union of status scans
(extract.py:49-68), the XCom list flattening (etl_process.py:68-77), and
the staging delete set-algebra (load.py:222-228).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.text import concat_path, parse_timestamp_ntz, sanitize_name, split_extract
from ..registry import query

# ---------------------------------------------------------------- projections


@query("project_users", oracle="""
SELECT c_custkey AS id,
       c_name AS name,
       coalesce(c_mktsegment, 'unknown') AS segment,
       round(c_acctbal, 2) AS balance
FROM customer
""")
def project_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered field projection with NULL defaulting (ref load.py:96-109)."""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.coalesce(F.col("c_mktsegment"), F.lit("unknown")).alias("segment"),
        F.round("c_acctbal", 2).alias("balance"),
    )


@query("project_filter", oracle="""
SELECT o_orderkey AS order_id,
       o_orderstatus AS status,
       round(o_totalprice, 2) AS total
FROM orders
WHERE o_orderstatus IS NOT NULL AND o_totalprice > 0
""")
def project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + falsy-row drop (ref load.py:137-150). Filter sits
    directly over the scan → pushed into the parquet reader."""
    o = table(spark, sf_dir, "orders")
    return (o.filter(F.col("o_orderstatus").isNotNull() & (F.col("o_totalprice") > 0))
            .select(F.col("o_orderkey").alias("order_id"),
                    F.col("o_orderstatus").alias("status"),
                    F.round("o_totalprice", 2).alias("total")))


@query("project_participants", oracle="""
SELECT l_orderkey AS order_id,
       l_linenumber AS line_no,
       round(l_quantity, 2) AS qty,
       coalesce(l_returnflag = 'R', FALSE) AS returned
FROM lineitem
""")
def project_participants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with boolean defaulting (ref load.py:178-190 internal_user)."""
    return table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.round("l_quantity", 2).alias("qty"),
        F.coalesce(F.col("l_returnflag") == "R", F.lit(False)).alias("returned"),
    )


@query("validate_required", oracle="""
SELECT event_id, user_id, event_type
FROM events
WHERE event_id IS NOT NULL AND ts IS NOT NULL
  AND user_id IS NOT NULL AND event_type IS NOT NULL
""")
def validate_required(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Required-field validation gate (ref handler.py:46-52); the rejected
    complement carries a typed reason (operators/quarantine.py, tested in
    tests/test_quarantine_credentials.py)."""
    from ..operators.quarantine import required_fields_rules, validate_split
    e = table(spark, sf_dir, "events")
    valid, _quarantined = validate_split(
        e, required_fields_rules("event_id", "ts", "user_id", "event_type"))
    return valid.select("event_id", "user_id", "event_type")


# ------------------------------------------------------------ scalar functions


@query("parse_timestamp", oracle="""
SELECT event_id,
       try_strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed
FROM events
""")
def parse_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-on-failure timestamp parse (ref load.py:52-69): format to string
    then try_to_timestamp — never the throwing variant."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        parse_timestamp_ntz(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
                            "yyyy-MM-dd HH:mm:ss").alias("parsed"),
    )


@query("sanitize_string", oracle=r"""
SELECT p_partkey AS part_id,
       coalesce(nullif(substring(regexp_replace(p_name, '[/:*?"<>|\\]', '_', 'g'), 1, 255), ''),
                'unknown') AS clean_name
FROM part
""")
def sanitize_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filesystem-name sanitization (ref utils.py:82-88)."""
    p = table(spark, sf_dir, "part")
    return p.select(F.col("p_partkey").alias("part_id"),
                    sanitize_name("p_name").alias("clean_name"))


@query("concat_path", oracle="""
SELECT c_custkey AS id,
       concat_ws('/', 'records', c_mktsegment, c_name) AS path
FROM customer
""")
def concat_path_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-store key construction (ref handler.py:70,86)."""
    c = table(spark, sf_dir, "customer")
    return c.select(F.col("c_custkey").alias("id"),
                    concat_path(F.lit("records"), "c_mktsegment", "c_name").alias("path"))


@query("split_extract", oracle="""
SELECT c_custkey AS id,
       split_part(c_name, '#', 2) AS cust_no
FROM customer
""")
def split_extract_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimiter-split field extraction (ref extract.py:157-158)."""
    c = table(spark, sf_dir, "customer")
    return c.select(F.col("c_custkey").alias("id"),
                    split_extract("c_name", "#", 1).alias("cust_no"))


@query("base64_encode", oracle="""
SELECT c_custkey AS id,
       to_base64(encode(c_name)) AS name_b64
FROM customer
""")
def base64_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 credential encoding (ref oauth.py:24-26)."""
    c = table(spark, sf_dir, "customer")
    return c.select(F.col("c_custkey").alias("id"),
                    F.base64(F.encode(F.col("c_name"), "UTF-8")).alias("name_b64"))


@query("date_range_explode", oracle="""
WITH b AS (
  SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi
  FROM orders
)
SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                   INTERVAL 30 DAY)) AS DATE) AS d
FROM b
""")
def date_range_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day range chunking (ref extract.py:98-104): sequence + explode.
    The bounds are a 1-row aggregate, so the explode is driver-cheap."""
    o = table(spark, sf_dir, "orders")
    b = o.agg(F.min(F.to_date("o_orderdate")).alias("lo"),
              F.max(F.to_date("o_orderdate")).alias("hi"))
    return b.select(F.explode(
        F.sequence("lo", "hi", F.expr("interval 30 days"))).alias("d"))


@query("json_extract", oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
""")
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload field extraction (ref handler.py:43-44)."""
    e = table(spark, sf_dir, "events")
    return e.select("event_id",
                    F.get_json_object("props", "$.k").cast("int").alias("k"))


# ------------------------------------------------------------------- set ops


@query("union_distinct", oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""")
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-status scan union + dedup (ref extract.py:49-68)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.unionByName(b).distinct()


@query("dedup_distinct", oracle="""
SELECT DISTINCT c_mktsegment AS segment, c_nationkey AS nationkey FROM customer
""")
def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-style dedup (ref extract.py:68) — hash aggregate."""
    c = table(spark, sf_dir, "customer")
    return c.select(F.col("c_mktsegment").alias("segment"),
                    F.col("c_nationkey").alias("nationkey")).distinct()


@query("set_except", oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staging-minus-merged set difference (ref load.py:222-228)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


@query("set_intersect", oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-to-delete intersection (ref load.py:222-228 complement)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


# ---------------------------------------------------------------- array / JSON


@query("array_flatten", oracle="""
SELECT doc_id,
       CAST(len(flatten([string_split(text, ' '), ['<eos>']])) AS INTEGER) AS n_items
FROM documents
""")
def array_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-list flattening (ref etl_process.py:68-73)."""
    d = table(spark, sf_dir, "documents")
    nested = F.array(F.split("text", " "), F.array(F.lit("<eos>")))
    return d.select("doc_id", F.size(F.flatten(nested)).alias("n_items"))


@query("child_explode", oracle="""
SELECT doc_id, token
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
""")
def child_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per child element with falsy-skip (ref etl_process.py:75-77)."""
    d = table(spark, sf_dir, "documents")
    return (d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
            .filter(F.col("token") != ""))


@query("coalesce_fallback", oracle="""
WITH unioned AS (
  SELECT o_orderkey, o_orderdate, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderstatus <> 'P'
  UNION ALL
  SELECT o_orderkey, o_orderdate, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
  FROM orders WHERE o_orderstatus = 'P'
)
SELECT o_orderkey AS order_id,
       o_orderdate AS order_date,
       round(coalesce(o_totalprice, 0.0), 2) AS total,
       coalesce(o_orderpriority, 'UNKNOWN') AS priority
FROM unioned
""")
def coalesce_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-source schema alignment + default fill (ref extract.py:153-169:
    webinar fallback rows lack end_time/participants_count → NULL-injected
    then coalesced). unionByName(allowMissingColumns) does the alignment."""
    o = table(spark, sf_dir, "orders")
    full = (o.filter(F.col("o_orderstatus") != "P")
            .select("o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"))
    fallback = (o.filter(F.col("o_orderstatus") == "P")
                .select("o_orderkey", "o_orderdate"))
    u = full.unionByName(fallback, allowMissingColumns=True)
    return u.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").alias("order_date"),
        F.round(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), 2).alias("total"),
        F.coalesce(F.col("o_orderpriority"), F.lit("UNKNOWN")).alias("priority"),
    )


@query("dq_checks", oracle="""
SELECT 'orders_pk_unique' AS rule, CAST(count(*) AS BIGINT) AS n_violations
FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
UNION ALL
SELECT 'lineitem_fk_orders', CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'customer_acctbal_range', CAST(count(*) AS BIGINT)
FROM customer WHERE c_acctbal < -1000 OR c_acctbal > 100000
UNION ALL
SELECT 'events_type_domain', CAST(count(*) AS BIGINT)
FROM events WHERE event_type NOT IN
  ('click', 'view', 'purchase', 'signup', 'error')
UNION ALL
SELECT 'documents_text_nonnull', CAST(count(*) AS BIGINT)
FROM documents WHERE text IS NULL OR doc_id IS NULL
""")
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the dbt-test / Deequ shape):
    primary-key uniqueness, referential integrity, numeric range, value
    domain, non-null — each rule one violation COUNT, so the report is
    rule-cardinality-sized no matter the table size. This is the engine
    form of the reference's scattered imperative guards (required-field
    validation handler.py:46-52, FK-gated merge load.py:203-208) turned
    into one auditable query. Plan: uniqueness is a map-combined
    count-HAVING; the FK check is a LEFT-ANTI join (broadcast-eligible
    dim); everything else is a scan-local conditional count — 5 rules,
    one pass each, no data-sized shuffle except the keyed dedup check."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")
    e = table(spark, sf_dir, "events")
    d = table(spark, sf_dir, "documents")

    def one(rule: str, cnt) -> DataFrame:
        return cnt.select(F.lit(rule).alias("rule"),
                          F.col("n").cast("long").alias("n_violations"))

    pk = one("orders_pk_unique",
             (o.groupBy("o_orderkey").count().filter(F.col("count") > 1)
              .agg(F.count("*").alias("n"))))
    fk = one("lineitem_fk_orders",
             (l.join(o, l.l_orderkey == o.o_orderkey, "left_anti")
              .agg(F.count("*").alias("n"))))
    rng = one("customer_acctbal_range",
              c.filter((F.col("c_acctbal") < -1000)
                       | (F.col("c_acctbal") > 100000))
              .agg(F.count("*").alias("n")))
    dom = one("events_type_domain",
              e.filter(~F.col("event_type").isin(
                  "click", "view", "purchase", "signup", "error"))
              .agg(F.count("*").alias("n")))
    nn = one("documents_text_nonnull",
             d.filter(F.col("text").isNull() | F.col("doc_id").isNull())
             .agg(F.count("*").alias("n")))
    return pk.unionByName(fk).unionByName(rng).unionByName(dom).unionByName(nn)


@query("histogram_value", oracle="""
WITH b AS (
  -- DuckDB has no width_bucket: spell out the Postgres semantics
  -- (0 = underflow, 21 = overflow, else floor(v/width)+1; width = 5
  -- is exactly representable so the arithmetic is engine-identical)
  SELECT CASE WHEN value < 0 THEN 0
              WHEN value >= 100 THEN 21
              ELSE CAST(floor(value / 5) AS INT) + 1 END AS bucket
  FROM events
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY 1
""")
def histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bucket value histogram (width_bucket, 20 equal bins over
    [0,100] + under/overflow bins) — the distribution profile every
    monitoring dashboard draws. One scan-local bucket expression + one
    map-combined count keyed by a ≤22-value bucket id: the shuffle is
    bucket-cardinality-sized, so the plan is identical at 100 TB."""
    e = table(spark, sf_dir, "events")
    return (e.select(F.width_bucket("value", F.lit(0), F.lit(100), F.lit(20))
                     .cast("int").alias("bucket"))
            .groupBy("bucket").agg(F.count("*").cast("long").alias("n")))


@query("set_except_all", oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag-semantics difference (each occurrence cancels
    one occurrence, SQL:1999): the multiplicity-preserving sibling of
    ``set_except``. Spark plans exceptAll as a counted anti-semantics
    rewrite (generate over per-key count deltas) — one key shuffle, no
    distinct, matching the bag algebra exactly."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b)


@query("set_intersect_all", oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag-semantics intersection (min of the two
    multiplicities per value). Same counted rewrite as EXCEPT ALL."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b)


@query("null_semantics_wide", oracle="""
SELECT event_id,
       nullif(event_type, 'error') AS type_or_null,
       CASE WHEN value IS NOT NULL THEN 'has' ELSE 'none' END AS nvl2_tag,
       (value IS NOT DISTINCT FROM 0.5) AS nullsafe_eq_half,
       (event_type IN ('click', 'view')) AS in_clickview,
       (NULL IN ('x')) IS NULL AS null_in_is_null,
       coalesce(CAST(NULL AS VARCHAR), NULL, event_type, '?') AS first_nonnull
FROM events
""")
def null_semantics_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI NULL-semantics sweep pinning the traps every engine pair
    disagrees on somewhere: NULLIF, NVL2-style presence tags, null-safe
    equality (Spark `<=>` ≡ SQL IS NOT DISTINCT FROM), NULL membership
    in IN (three-valued: NULL, not false), and coalesce chains through
    typed NULLs. Pure row-local codegen; the value of the row is the
    CONTRACT — these exact truth tables are what §2.2's validation
    operators rely on."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.nullif("event_type", F.lit("error")).alias("type_or_null"),
        F.nvl2("value", F.lit("has"), F.lit("none")).alias("nvl2_tag"),
        F.col("value").eqNullSafe(F.lit(0.5)).alias("nullsafe_eq_half"),
        F.col("event_type").isin("click", "view").alias("in_clickview"),
        F.lit(None).cast("string").isin("x").isNull()
        .alias("null_in_is_null"),
        F.coalesce(F.lit(None).cast("string"), F.lit(None),
                   F.col("event_type"), F.lit("?")).alias("first_nonnull"))


@query("nest_child_collect", oracle="""
SELECT o_orderkey,
       CAST(count(*) AS BIGINT) AS n_items,
       -- tie-break on the item string: the synthetic data duplicates
       -- (orderkey, linenumber), and Spark's struct sort breaks those
       -- ties lexicographically on the payload
       list(l_partkey || ':' || CAST(l_quantity AS BIGINT)
            ORDER BY l_linenumber,
                     l_partkey || ':' || CAST(l_quantity AS BIGINT)) AS items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
""")
def nest_child_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse of ``child_explode``: re-nest a child table under its
    parent as an ORDERED array (the document-building step before a JSON
    sink or a feature-store write — the reference builds exactly this
    shape in reverse when it flattens API payloads, src/zoom/
    transform.py). Line items collect per order, ordered by line number
    inside the aggregate — sort_array over (sortkey, payload) structs
    keeps the ordering deterministic under any partitioning, and the
    order-exact array comparison gates it. One orderkey shuffle; array
    sizes are bounded by order width (≤7 TPC-H lines), never corpus."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    item = F.concat_ws(
        ":", F.col("l_partkey"), F.col("l_quantity").cast("long"))
    pairs = (li.select("l_orderkey", F.struct(
        F.col("l_linenumber").alias("ln"), item.alias("it")).alias("p")))
    nested = (pairs.groupBy("l_orderkey")
                   .agg(F.count("*").alias("n_items"),
                        F.transform(F.sort_array(F.collect_list("p")),
                                    lambda s: s["it"]).alias("items")))
    return (nested.join(o, nested["l_orderkey"] == o["o_orderkey"])
                  .select("o_orderkey", "n_items", "items"))


@query("lineage_flagship", oracle="""
SELECT * FROM (VALUES
  ('n_orders', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
  ('nation',  'nation', 'n_name'),
  ('rank',    'nation', 'n_name'),
  ('rank',    'orders', 'o_totalprice'),
  ('rank',    'region', 'r_name'),
  ('region',  'region', 'r_name'),
  ('revenue', 'orders', 'o_totalprice')
) t(out_col, src_table, src_col)
""")
def lineage_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level lineage of the flagship plan AS a contract query
    (zoom_etl_spark/lineage.py): every output column resolved through
    the analyzed plan's exprId graph to its base (table, column)
    sources — count(*) outputs correctly resolve to NO source. The
    oracle is the GOLDEN expected mapping (a VALUES table): metadata
    extraction is deterministic for a fixed plan, so lineage itself is
    value-hash-gated like any data query — if a refactor of the
    flagship plan changes what feeds an output column, this row goes
    red. Driver-side only; nothing executes on the cluster."""
    from .. import plans
    from ..lineage import column_lineage
    lin = column_lineage(plans.flagship(spark, sf_dir))
    rows = []
    for out, srcs in sorted(lin.items()):
        if not srcs:
            rows.append((out, None, None))
        for src, col in sorted(srcs):
            base = src.rstrip("/").split("/")[-1].replace(".parquet", "")
            rows.append((out, base, col))
    return spark.createDataFrame(
        rows, "out_col STRING, src_table STRING, src_col STRING")
