"""Pure-Python replay gates for table_fingerprint (hashlib.md5 over
the same canonical strings — proving the checksum is genuinely
engine-portable, not a Spark/DuckDB coincidence) and ols_two_factor
(numpy least-squares cross-check of the Cramer closed form)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from zoom_etl_spark.registry import all_queries


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_table_fingerprint_replays(spark, sf_dir):
    got = {r["col"]: r.asDict() for r in
           all_queries()["table_fingerprint"].fn(spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    n = len(o)
    canon = {
        "o_orderkey": o["o_orderkey"].map(lambda v: str(int(v))),
        "o_custkey": o["o_custkey"].map(lambda v: str(int(v))),
        "o_orderstatus": o["o_orderstatus"].astype(str),
        "total_cents": (o["o_totalprice"] * 100 + 0.5).map(
            lambda v: str(math.floor(v))),
        "o_orderdate": pd.to_datetime(o["o_orderdate"]).dt.strftime(
            "%Y-%m-%d"),
        "o_orderpriority": o["o_orderpriority"].astype(str),
    }
    assert set(got) == set(canon)
    for col, series in canon.items():
        want = sum(_h32(s) for s in series) % 2**32
        r = got[col]
        assert r["n_rows"] == n and r["n_null"] == 0
        assert r["checksum"] == want, col


def test_table_fingerprint_order_free(spark, sf_dir):
    """The defining reconciliation property: the checksum is a SUM, so
    any permutation / partitioning of the rows yields the same
    fingerprint — checked by repartitioning wildly."""
    from zoom_etl_spark.catalog import table
    base = {r["col"]: r["checksum"] for r in
            all_queries()["table_fingerprint"].fn(spark, sf_dir).collect()}
    assert len(base) == 6
    # independent recompute through a different partitioning of the scan
    o = table(spark, sf_dir, "orders").repartition(13, "o_orderstatus")
    o.createOrReplaceTempView("_fp_perm")
    from pyspark.sql import functions as F
    got = (o.agg(F.expr(
        "CAST(CAST(sum(CAST(instr('0123456789abcdef', "
        "substr(md5(CAST(o_orderkey AS STRING)), 1, 1)) - 1 AS BIGINT) "
        "* 268435456 "
        "+ CAST(instr('0123456789abcdef', "
        "substr(md5(CAST(o_orderkey AS STRING)), 2, 1)) - 1 AS BIGINT) "
        "* 16777216 "
        "+ CAST(instr('0123456789abcdef', "
        "substr(md5(CAST(o_orderkey AS STRING)), 3, 1)) - 1 AS BIGINT) "
        "* 1048576 "
        "+ CAST(instr('0123456789abcdef', "
        "substr(md5(CAST(o_orderkey AS STRING)), 4, 1)) - 1 AS BIGINT) "
        "* 65536 "
        "+ CAST(instr('0123456789abcdef', "
        "substr(md5(CAST(o_orderkey AS STRING)), 5, 1)) - 1 AS BIGINT) "
        "* 4096 "
        "+ CAST(instr('0123456789abcdef', "
        "substr(md5(CAST(o_orderkey AS STRING)), 6, 1)) - 1 AS BIGINT) "
        "* 256 "
        "+ CAST(instr('0123456789abcdef', "
        "substr(md5(CAST(o_orderkey AS STRING)), 7, 1)) - 1 AS BIGINT) "
        "* 16 "
        "+ CAST(instr('0123456789abcdef', "
        "substr(md5(CAST(o_orderkey AS STRING)), 8, 1)) - 1 AS BIGINT)) "
        "AS DECIMAL(38,0)) % 4294967296 AS BIGINT)").alias("ck"))
        .collect()[0]["ck"])
    assert got == base["o_orderkey"]


def test_ols_two_factor_replays(spark, sf_dir):
    row = all_queries()["ols_two_factor"].fn(
        spark, sf_dir).collect()[0].asDict()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o.assign(day=pd.to_datetime(o["o_orderdate"]).dt.date,
                 cents=(o["o_totalprice"] * 100 + 0.5).map(math.floor))
    d = (o.groupby("day")
          .agg(x1=("o_orderkey", "size"),
               x2=("o_custkey", "nunique"),
               y=("cents", "sum"))
          .reset_index())
    assert row["n_days"] == len(d)
    X = np.column_stack([np.ones(len(d)), d["x1"], d["x2"]])
    beta, *_ = np.linalg.lstsq(X, d["y"].to_numpy(dtype=float), rcond=None)
    assert row["beta0"] == pytest.approx(beta[0], rel=1e-6, abs=1e-3)
    assert row["beta1"] == pytest.approx(beta[1], rel=1e-6, abs=1e-6)
    assert row["beta2"] == pytest.approx(beta[2], rel=1e-6, abs=1e-6)
    pred = X @ beta
    yc = d["y"].to_numpy(dtype=float)
    ss_res = float(((yc - pred) ** 2).sum())
    ss_tot = float(((yc - yc.mean()) ** 2).sum())
    assert row["r2"] == pytest.approx(1 - ss_res / ss_tot, abs=1e-5)
    assert 0.0 <= row["r2"] <= 1.0
