"""The batch-ETL DAG analog (SURVEY §3.1): correct topology, FK ordering,
and rerun idempotency (the reference's watermark-guarded rerun contract)."""

from __future__ import annotations

import tempfile

from zoom_etl_spark.etl import extract_meetings, extract_users, run_batch_etl


def test_extract_dedup_and_expansion(spark):
    users = extract_users(spark, n_keys=12)
    assert users.count() == 12                      # early dedup: 1 per key
    meetings = extract_meetings(users)
    assert meetings.count() == sum(k % 4 + 1 for k in range(12))


def test_etl_run_idempotent(spark):
    base = tempfile.mkdtemp(prefix="zes_etl_")
    ut, mt = f"{base}/users", f"{base}/meetings"
    first = run_batch_etl(spark, ut, mt, n_keys=12)
    second = run_batch_etl(spark, ut, mt, n_keys=12)
    assert first == second                          # rerun changes nothing
    assert first["users"] == 12
    u = {tuple(r) for r in spark.read.parquet(ut).collect()}
    run_batch_etl(spark, ut, mt, n_keys=12)
    assert {tuple(r) for r in spark.read.parquet(ut).collect()} == u


def test_bad_sf_dir_raises_not_wrong_data(spark):
    """A wrong data path must fail loudly (PATH_NOT_FOUND), never return
    an empty-but-plausible result (verify-skill probe)."""
    import pytest
    from pyspark.errors import AnalysisException

    from zoom_etl_spark.catalog import table

    with pytest.raises(AnalysisException):
        table(spark, "/root/testdata/sf_does_not_exist", "orders").count()
