"""Generic, composable DataFrame operators.

Each operator is a plain ``DataFrame -> DataFrame`` function expressed with
built-in pyspark.sql.functions so Catalyst can optimize through it
(predicate pushdown, column pruning, join planning, whole-stage codegen).
"""

from .windows import last_wins, ntile_chunks, running_sum, topk_per_group
from .merge import merge_upsert, staging_merge

__all__ = [
    "topk_per_group", "running_sum", "ntile_chunks", "last_wins",
    "merge_upsert", "staging_merge",
]
