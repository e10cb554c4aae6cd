"""Named query suite — one module per SURVEY.md §2 operator family.

Each query is registered via ``zoom_etl_spark.registry.query`` with its
DuckDB oracle SQL. Conventions (driver contract):
  * every computed column is aliased identically in Spark and SQL;
  * double-typed aggregates are rounded explicitly in BOTH so the
    order-insensitive value hash matches despite summation-order drift;
  * integer-family types are cast so Spark and DuckDB schemas agree
    (DuckDB sum(int)→HUGEINT, len()→BIGINT, ntile()→BIGINT etc.).
"""
