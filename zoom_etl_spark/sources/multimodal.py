"""Multimodal column plumbing: opaque binary media + typed metadata.

Generalizes the reference's out-of-band media handling (blobs in
S3/Dropbox, only URI pointers kept relationally — reference
lambda/zoom_webhook/handler.py:70-87, sql/create_tables.sql:57-59) into
first-class columns: media as `binary`, metadata as a typed struct,
feature extraction as Arrow-batched `mapInPandas`.

The actual image/audio decode libraries are not in this container, so
`decode_media` raises NotImplementedError unless `fake=True`, in which
case a deterministic stand-in produces the feature columns. The Spark
plumbing — schema, batch iteration, partition behavior — is real and
tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("kind", StringType(), True),
    StructField("n_bytes", IntegerType(), True),
    StructField("checksum", LongType(), True),
])


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialize an opaque binary 'media' column + metadata struct from a
    text column (stand-in for reading real blobs via the binaryFile
    source). Schema shape is what a real media table would have."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").cast(BinaryType()).alias("media"),
        F.struct(
            F.lit("text/fake").alias("mime"),
            F.length(F.col(text_col)).alias("n_chars"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature-extract media blobs with Arrow-batched mapInPandas.

    Real decode (PIL/librosa/av) is unavailable in this container —
    `fake=False` raises NotImplementedError by design. The fake path is
    deterministic: kind from the mime, byte length, additive checksum.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires image/audio libs not in this container; "
            "run with fake=True for the deterministic stand-in")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": [m["mime"] for m in pdf["meta"]],
                "n_bytes": blobs.map(len).astype("int32"),
                # deterministic stand-in for a real feature (e.g. pHash)
                "checksum": blobs.map(lambda b: sum(b) % (1 << 31)).astype("int64"),
            })

    return df.mapInPandas(extract, FEATURE_SCHEMA)
