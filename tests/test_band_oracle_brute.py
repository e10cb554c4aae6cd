"""join_band_dates oracle independence (round-7 review finding): the
committed day-domain closed form must equal the ORIGINAL per-order
pair-join specification, checked entirely inside DuckDB at the SFs
where the ~n·band pair materialization is feasible. The closed form
exists only because the pair join was a 240–460 s IEJoin at sf0.1 —
this test keeps the pair semantics pinned so a shared conceptual error
in the closed form (self-exclusion, the n_near>0 drop) cannot pass
both engines unnoticed."""

from __future__ import annotations

import duckdb
import pytest

from zoom_etl_spark.registry import all_queries

PAIR_SQL = """
SELECT a.o_orderkey AS order_id, CAST(count(*) AS BIGINT) AS n_near
FROM orders a JOIN orders b
  ON abs(date_diff('day', b.o_orderdate, a.o_orderdate)) <= 1
 AND a.o_orderkey <> b.o_orderkey
GROUP BY 1
"""


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_day_domain_closed_form_equals_pair_join(sf):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('/root/testdata/{sf}/orders.parquet')")
    closed = all_queries()["join_band_dates"].oracle
    a = sorted(con.execute(PAIR_SQL).fetchall())
    b = sorted(con.execute(closed).fetchall())
    assert a == b and len(a) > 0
