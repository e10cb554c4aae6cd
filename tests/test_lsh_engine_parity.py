"""Cross-engine parity gates for the value-exact LSH oracles (round 6):
the promotion of similarity_ann_lsh / dedup_embedding_lsh rests on
Spark's sequential HOF folds being BIT-IDENTICAL to DuckDB's
list_sum/list_transform — sign-of-projection buckets and abs-margin
probe ORDERING are discontinuous, so this is asserted on a corpus of
seeded random vectors far larger than the fixture tables, not just
observed once on them."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from zoom_etl_spark.dedup.lsh import (_planes, hyperplane_bucket,
                                      probe_buckets)
from zoom_etl_spark.suite.northstar import (_bucket_sql, _mord_sql,
                                            _probes_sql, _projs_sql)

N_PLANES = 6
DIM = 64


def _corpus(n=4000, seed=123):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    # adversarial rows: near-zero projections (bucket-boundary bait) —
    # vectors almost orthogonal to plane 0, plus exact zeros
    planes = _planes(DIM, N_PLANES, seed=42)
    p0 = planes[0] / np.linalg.norm(planes[0])
    for i in range(0, n, 10):
        vecs[i] -= (vecs[i] @ p0).astype(np.float32) * p0.astype(np.float32)
    vecs[0] = 0.0
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": [list(map(float, v)) for v in vecs]})


def test_bucket_and_probes_bit_identical_across_engines(spark):
    pdf = _corpus()
    sdf = spark.createDataFrame(pdf)
    got = (sdf.select(
        "vec_id",
        hyperplane_bucket("embedding", DIM, N_PLANES, seed=42)
        .alias("bucket"),
        probe_buckets("embedding", DIM, N_PLANES, seed=42, n_flip=2)
        .alias("probes"))
        .toPandas().set_index("vec_id").sort_index())

    con = duckdb.connect()
    con.register("embeddings", pdf)
    duck = con.execute(f"""
        WITH pe AS (
          SELECT vec_id, {_projs_sql(_planes(DIM, N_PLANES, seed=42))}
                   AS projs
          FROM embeddings
        ),
        pb AS (SELECT vec_id, projs, ({_bucket_sql(N_PLANES)}) AS bucket
               FROM pe),
        pm AS (SELECT vec_id, bucket, {_mord_sql(N_PLANES)} AS mord
               FROM pb)
        SELECT vec_id, bucket, {_probes_sql(N_PLANES, 2)} AS probes
        FROM pm ORDER BY vec_id
    """).df().set_index("vec_id").sort_index()

    assert (got["bucket"].to_numpy()
            == duck["bucket"].to_numpy()).all()
    sp = [list(p) for p in got["probes"]]
    dp = [list(map(int, p)) for p in duck["probes"]]
    assert sp == dp  # probe ORDER (margin sort) must match too
