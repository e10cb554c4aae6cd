"""Column-level function library (pure pyspark.sql.functions compositions —
JVM-side, codegen-friendly; no Python UDFs in any hot path)."""

from .text import concat_path, parse_timestamp_ntz, sanitize_name, split_extract
from .vectors import cosine_similarity, l2_norm, dot

__all__ = [
    "sanitize_name", "concat_path", "split_extract", "parse_timestamp_ntz",
    "cosine_similarity", "l2_norm", "dot",
]
