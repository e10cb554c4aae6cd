"""zoom_etl_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine providing the query and
data-processing capabilities surveyed from the reference ETL pipeline
(``anhdnguye/Zoom-ETL``, see SURVEY.md), re-expressed as lazy DataFrame
programs optimized by Catalyst, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Layout:
    session    — SparkSession configuration helpers (UTC, AQE, tuned shuffle)
    catalog    — parquet table registry over the testdata star schema
    operators/ — generic composable DataFrame operators (joins, windows, merge…)
    functions/ — scalar/column function library (text, timestamps, vectors)
    dedup/     — exact + approximate deduplication (minhash-LSH, simhash…)
    sources/   — custom sources (paginated REST DataSource, multimodal binary)
    streaming/ — Structured Streaming ingest (watermark, staging append)
    suite/     — concrete named queries over the testdata tables, each with
                 a DuckDB oracle (the driver correctness contract)
"""

__version__ = "0.1.0"
