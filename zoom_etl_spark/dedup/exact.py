"""Exact deduplication: normalize → hash → groupBy.

At 100 TB, grouping on a 128-bit content hash (not the full text) keeps
shuffle rows narrow: the heavy ``text`` column is dropped before the
exchange and the canonical row is recovered by re-joining keepers on
doc_id if needed. The generalization of the reference's pre-fan-out
``list(set(...))`` dedup (reference src/zoom/extract.py:68).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Canonical text form: lowercase, trim, collapse internal whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def exact_dedup_keys(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct normalized text: (content_hash, keeper_id,
    n_dups). Keeper = min id (deterministic). Narrow shuffle: only
    (hash, id) cross the exchange."""
    hashed = df.select(
        F.md5(normalize_text(text_col)).alias("content_hash"),
        F.col(id_col),
    )
    return hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("keeper_id"),
        F.count("*").alias("n_dups"),
    )
