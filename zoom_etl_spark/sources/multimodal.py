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


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("frame_no", IntegerType(), False),
    StructField("frame_checksum", LongType(), True),
])


def sample_frames(df: DataFrame, every_n_bytes: int = 32,
                  max_frames: int = 8, fake: bool = True) -> DataFrame:
    """One-to-many frame sampling from media blobs (video → frames) via
    mapInPandas — each input row yields up to ``max_frames`` rows.

    Real frame decode (pyav/ffmpeg) is unavailable in this container —
    ``fake=False`` raises NotImplementedError by design; the fake path
    deterministically 'samples' byte windows as frames. The one-to-many
    Arrow-batched plumbing (the part that matters at scale: no per-row
    Python, output can exceed input) is real.
    """
    if not fake:
        raise NotImplementedError(
            "real frame sampling requires video libs not in this container; "
            "run with fake=True for the deterministic stand-in")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_cks = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                for i in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    window = blob[i * every_n_bytes:(i + 1) * every_n_bytes]
                    out_ids.append(doc_id)
                    out_nos.append(i)
                    out_cks.append(sum(window) % (1 << 31))
            yield pd.DataFrame({"doc_id": out_ids,
                                "frame_no": pd.array(out_nos, dtype="int32"),
                                "frame_checksum": pd.array(out_cks, dtype="int64")})

    return df.mapInPandas(frames, FRAME_SCHEMA)
