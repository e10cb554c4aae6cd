"""Vectorized (Arrow) reference implementations of native operators —
SURVEY.md §2.11: each hot-path operator that could plausibly need Python
gets BOTH a native column-expression form (preferred, codegen) and a
pandas_udf/applyInPandas form, with parity tests pinning them equal.

Use the native forms in production plans; these exist to (a) prove the
semantics match, (b) be the template when an operator genuinely needs
Python (model scoring, custom tokenizers), where Arrow batching is the
only acceptable shape — never row-at-a-time Python UDFs.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_ILLEGAL_RE = re.compile(r'[/:*?"<>|\\]')


@pandas_udf(StringType())
def sanitize_name_pandas(names: pd.Series) -> pd.Series:
    """Vectorized twin of functions.text.sanitize_name (ref utils.py:82-88)."""
    cleaned = names.fillna("").map(lambda s: _ILLEGAL_RE.sub("_", s)[:255])
    return cleaned.mask(cleaned == "", "unknown")


def preference_top1_pandas(files: DataFrame, prefs: DataFrame,
                           group_keys: list[str]) -> DataFrame:
    """applyInPandas twin of the preference top-1 select (ref
    handler.py:18-36, native form = broadcast join + window row_number).
    Grouped-map: each (meeting, category) group arrives as one pandas
    frame; keep the best-priority row, ties broken by id DESC."""
    joined = files.join(F.broadcast(prefs), "recording_type")

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        best = pdf.sort_values(["priority", "id"], ascending=[True, False])
        return best.head(1)

    return joined.groupBy(*group_keys).applyInPandas(pick, joined.schema)


def zscore_native(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-group z-score, native window form (one shuffle on key)."""
    from pyspark.sql import Window
    w = Window.partitionBy(key)
    mu = F.avg(value).over(w)
    sd = F.stddev_pop(value).over(w)
    return df.withColumn("zscore",
                         F.when(sd != 0, (F.col(value) - mu) / sd).otherwise(0.0))


def zscore_pandas(df: DataFrame, key: str, value: str) -> DataFrame:
    """applyInPandas twin: the reference's per-chunk Python transforms
    (etl_process.py:50-102) map to exactly this grouped-map shape."""
    # StructType.add mutates in place — build a fresh schema, never extend
    # the input DataFrame's own schema object
    from pyspark.sql.types import DoubleType, StructField, StructType
    schema = StructType(list(df.schema.fields)
                        + [StructField("zscore", DoubleType(), True)])

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf[value].std(ddof=0)
        pdf = pdf.copy()
        pdf["zscore"] = 0.0 if (sd == 0 or pd.isna(sd)) else (pdf[value] - pdf[value].mean()) / sd
        return pdf

    return df.groupBy(key).applyInPandas(norm, schema)


def token_stats_mapinpandas(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """mapInPandas form of per-doc token stats — the per-partition
    imperative shape (ref S1/S4 extraction loops): arbitrary Python per
    Arrow batch, streaming through partitions without grouping."""
    from pyspark.sql.types import LongType, IntegerType, StructField, StructType
    out_schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("n_tokens", IntegerType(), True),
    ])

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "n_tokens": pdf[text_col].fillna("").map(
                    lambda s: len([t for t in s.split(" ") if t])).astype("int32"),
            })

    return df.mapInPandas(stats, out_schema)
