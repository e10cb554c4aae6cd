"""Source-format breadth: JSON and CSV round-trips with explicit schemas
(never inferred in production paths — SURVEY §1.3), and the binaryFile
source for out-of-band media blobs (S10, reference handler.py:73-87)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from zoom_etl_spark.catalog import table


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents").select("doc_id", "text", "lang")


def test_json_roundtrip_explicit_schema(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="zes_json_") + "/docs"
    d.write.json(out)
    back = spark.read.schema(d.schema).json(out)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in d.collect()}


def test_csv_roundtrip_explicit_schema(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="zes_csv_") + "/docs"
    d.write.option("header", True).option("quoteAll", True).csv(out)
    back = spark.read.schema(d.schema).option("header", True).csv(out)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in d.collect()}


def test_corrupt_json_permissive_mode(spark, sf_dir):
    """PERMISSIVE read: bad lines land in _corrupt_record, good lines
    parse — the missing-field→NULL regime of the reference loader."""
    d = tempfile.mkdtemp(prefix="zes_badjson_")
    with open(f"{d}/part.json", "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write('{"doc_id": 2 BROKEN\n')
        f.write('{"doc_id": 3}\n')  # missing field → NULL, not corrupt
    schema = "doc_id long, text string, _corrupt_record string"
    back = spark.read.schema(schema).option("mode", "PERMISSIVE") \
        .option("columnNameOfCorruptRecord", "_corrupt_record").json(d)
    rows = {r.doc_id: (r.text, r._corrupt_record is not None) for r in back.collect()}
    assert rows[1] == ("ok", False)
    assert rows[3] == (None, False)          # missing field → NULL
    assert None in rows and rows[None][1]    # corrupt line captured


def test_binaryfile_source(spark):
    """binaryFile source: media blobs as (path, length, content) rows —
    the engine-native form of the reference's S3 pointer pattern."""
    d = tempfile.mkdtemp(prefix="zes_bin_")
    blobs = {f"rec_{i}.m4a": bytes([i] * (10 + i)) for i in range(3)}
    for name, content in blobs.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(content)
    df = (spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.m4a").load(d)
          .select(F.element_at(F.split("path", "/"), -1).alias("name"),
                  "length", "content"))
    got = {r.name: (r.length, bytes(r.content)) for r in df.collect()}
    assert got == {n: (len(c), c) for n, c in blobs.items()}


def test_normalize_event_ts_all_layouts(spark):
    """The driver testdata's events.ts physical type has changed TWICE
    across regenerations (TIMESTAMP(NANOS)-as-long in rounds 1-2,
    TIMESTAMP_NTZ micros since, plain TIMESTAMP always possible).
    `catalog.normalize_event_ts` must map all three to the identical
    session-TZ timestamp — pin every branch so the next layout shift
    fails here instead of in 200 queries."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql.types import (LongType, StructField, StructType,
                                   TimestampNTZType, TimestampType)

    from zoom_etl_spark.catalog import normalize_event_ts

    base = datetime.datetime(2024, 1, 5, 12, 34, 56, 789123)
    micros = int(base.replace(tzinfo=datetime.timezone.utc).timestamp()
                 * 1_000_000)
    nanos_df = spark.createDataFrame(
        [(micros * 1000 + 999,)],  # sub-micro digits must truncate
        StructType([StructField("ts", LongType())]))
    ntz_df = spark.createDataFrame(
        [(base,)], StructType([StructField("ts", TimestampNTZType())]))
    tz_df = spark.createDataFrame(
        [(base,)], StructType([StructField("ts", TimestampType())]))

    outs = [normalize_event_ts(df) for df in (nanos_df, ntz_df, tz_df)]
    for out in outs:
        assert isinstance(out.schema["ts"].dataType, TimestampType)
    got = [out.select(F.unix_micros("ts")).first()[0] for out in outs]
    assert got[0] == got[1] == got[2] == micros, got
