"""Every registered query with an oracle must match DuckDB exactly at the
smoke SF — the local version of the driver's CORRECTNESS gate. Rows-only
queries must run and return a stable non-degenerate schema."""

from __future__ import annotations

import pytest

from zoom_etl_spark.registry import all_queries
from .oracle_harness import compare, duck_connection

_SPECS = all_queries()
_WITH_ORACLE = sorted(n for n, s in _SPECS.items() if s.oracle)
_ROWS_ONLY = sorted(n for n, s in _SPECS.items() if not s.oracle)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, sf_dir, duck, name):
    spec = _SPECS[name]
    df = spec.fn(spark, sf_dir)
    report = compare(df, duck, spec.oracle)
    assert report["ok"], f"{name}: {report}"


def test_rows_only_runs(spark, sf_dir):
    """The rows-only ledger is EMPTY as of round 9 (every registered
    query carries an oracle), so this usually asserts exactly that; the
    loop remains the forward contract for any future justified entry —
    a parametrize over the empty list would report a perpetual skip."""
    for name in _ROWS_ONLY:
        spec = _SPECS[name]
        df = spec.fn(spark, sf_dir)
        assert len(df.columns) > 0, name
        assert df.count() >= 0, name


def test_flagship_entry(spark):
    import __spark_entry__ as entrymod
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"region", "nation", "n_orders", "revenue", "rank"}


def test_flagship_oracle(spark, sf_dir, duck):
    from zoom_etl_spark import plans
    report = compare(plans.flagship(spark, sf_dir), duck, plans.FLAGSHIP_ORACLE)
    assert report["ok"], report
