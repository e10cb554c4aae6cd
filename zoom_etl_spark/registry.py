"""Query registry — the single source of truth binding SURVEY.md §2 query
names to (PySpark implementation, DuckDB oracle SQL).

``__spark_entry__.py`` re-exports this registry to the driver. Every
``@query`` registration with an ``oracle=`` string is hash-checked against
DuckDB at sf 0.01; registrations without an oracle get the weaker
rows-only check (reserved for genuinely non-SQL-expressible operators).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query. Column names in the DataFrame MUST match the
    oracle's column aliases exactly (driver sorts columns by name before
    hashing values)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                    doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    _load_suite()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_queries().items() if s.oracle is not None}


_loaded = False


def _load_suite() -> None:
    """Import suite modules for their registration side effects."""
    global _loaded
    if _loaded:
        return
    from .suite import (  # noqa: F401
        aggregates,
        analytics,
        correlate,
        curation,
        geo,
        graph,
        joins,
        layout,
        merge,
        mining,
        mleval,
        northstar,
        privacy,
        relational,
        retrieval,
        scalars_wide,
        scoring,
        semantic,
        sources_streaming,
        stats,
        timeseries,
        tpch,
        windows,
    )
    _loaded = True
