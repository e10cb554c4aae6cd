"""Generic, composable DataFrame operators.

Each operator is a plain ``DataFrame -> DataFrame`` function expressed with
built-in pyspark.sql.functions so Catalyst can optimize through it
(predicate pushdown, column pruning, join planning, whole-stage codegen).
"""

from .windows import last_wins, ntile_chunks, running_sum, topk_per_group
from .merge import merge_upsert, staging_merge
from .joins import asof_join, auto_join, salted_join, skew_stats
from .bucketing import colocated_join, write_bucketed
from .maintenance import compact_partition, merge_into_partitioned
from .quarantine import required_fields_rules, validate_split

__all__ = [
    "topk_per_group", "running_sum", "ntile_chunks", "last_wins",
    "merge_upsert", "staging_merge",
    "asof_join", "auto_join", "salted_join", "skew_stats",
    "write_bucketed", "colocated_join",
    "merge_into_partitioned", "compact_partition",
    "validate_split", "required_fields_rules",
]
