"""Registry-wide DuckDB lexical-type gate for every oracle text.

DuckDB widens integer aggregates silently — ``sum(BIGINT)`` returns
HUGEINT, ``sum(INTEGER)`` (including windowed sums) returns HUGEINT —
while Spark stays on bigint. The driver's correctness hash covers the
lexical type, so a HUGEINT oracle column hash-mismatches even when every
value is identical (this exact class produced all 10 red rows in
CORRECTNESS_r03 and 8 more latent ones). The fix is always a mechanical
``CAST(... AS BIGINT)`` in the oracle text; this gate makes the class
unreintroducible: it binds EVERY registered oracle (and the flagship)
against DuckDB at the smoke SF and asserts no result column — including
list element types — is HUGEINT/UHUGEINT.

Binding is plan-time only (DuckDB relations are lazy), so the whole
registry gates in seconds.
"""

from __future__ import annotations

import pytest

from zoom_etl_spark.registry import all_queries
from .oracle_harness import duck_connection

_SPECS = all_queries()
_WITH_ORACLE = sorted(n for n, s in _SPECS.items() if s.oracle)

_BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def _banned_cols(con, sql):
    rel = con.sql(sql)
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if any(b in str(t).upper() for b in _BANNED)]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_no_hugeint(duck, name):
    bad = _banned_cols(duck, _SPECS[name].oracle)
    assert not bad, (
        f"{name}: oracle emits driver-hash-breaking DuckDB types {bad}; "
        f"CAST the column(s) AS BIGINT in the oracle text")


def test_flagship_oracle_no_hugeint(duck):
    from zoom_etl_spark import plans
    bad = _banned_cols(duck, plans.FLAGSHIP_ORACLE)
    assert not bad, bad
