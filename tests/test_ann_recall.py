"""ANN quality gates: recall@10 vs exact brute force (ROADMAP item 4).

Everything is seeded/deterministic (fixed hyperplanes, fixed k-means
init, deterministic tie-breaks), so the thresholds are real floors
measured on the sf0.001 embeddings, with headroom. The structural claim
— multi-probe candidate sets are supersets, so recall is monotone in
probe count — is asserted exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zoom_etl_spark.catalog import table
from zoom_etl_spark.dedup.ivf import ann_topk_ivf
from zoom_etl_spark.dedup.lsh import ann_topk_lsh
from zoom_etl_spark.functions.vectors import cosine_similarity
from zoom_etl_spark.operators.windows import topk_per_group

DIM = 64
K = 10


@pytest.fixture(scope="module")
def ann_fixture(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding")
    queries = corpus.limit(50)
    c = corpus.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").alias("c_emb"))
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_emb"))
    cand = (q.crossJoin(c)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", F.round(cosine_similarity("q_emb", "c_emb"), 6)))
    truth = topk_per_group(
        cand.select("query_id", "neighbor_id", "sim"), keys=["query_id"],
        order=[F.col("sim").desc(), F.col("neighbor_id").asc()], k=K)
    tsets: dict = {}
    for r in truth.collect():
        tsets.setdefault(r.query_id, set()).add(r.neighbor_id)
    return corpus, queries, tsets


def _recall(df, tsets) -> float:
    got: dict = {}
    for r in df.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    return sum(len(got.get(k, set()) & s) / len(s)
               for k, s in tsets.items()) / len(tsets)


def test_lsh_multiprobe_recall_monotone(ann_fixture):
    corpus, queries, tsets = ann_fixture
    recalls = [
        _recall(ann_topk_lsh(corpus, queries, "vec_id", "embedding", DIM,
                             k=K, n_planes=4, n_flip=nf), tsets)
        for nf in (0, 2, 4)]
    # superset candidate sets → recall can only improve with more probes
    assert recalls[0] <= recalls[1] <= recalls[2], recalls
    # measured 0.148 / 0.336 / 0.47 on sf0.001 — floors with headroom
    assert recalls[2] >= 0.40, recalls


@pytest.mark.parametrize("target", [0.3, 0.45])
def test_lsh_autotune_hits_recall_target(ann_fixture, target):
    """tune_lsh_flips must return the SMALLEST n_flip meeting the target
    (monotone supersets ⇒ first hit is optimal), with measured recall
    actually ≥ target."""
    from zoom_etl_spark.dedup.tune import tune_lsh_flips
    corpus, queries, _ = ann_fixture
    out = tune_lsh_flips(corpus, queries, "vec_id", "embedding", DIM,
                         k=K, n_planes=4, target_recall=target)
    assert out["met"] and out["recall"] >= target, out
    # minimality: every earlier setting in the trace fell short
    assert all(r < target for _, r in out["trace"][:-1]), out["trace"]


def test_ivf_autotune_hits_recall_target(ann_fixture):
    from zoom_etl_spark.dedup.tune import tune_ivf_probes
    corpus, queries, _ = ann_fixture
    out = tune_ivf_probes(corpus, queries, "vec_id", "embedding", DIM,
                          k=K, n_cells=16, target_recall=0.9)
    assert out["met"] and out["recall"] >= 0.9, out
    assert all(r < 0.9 for _, r in out["trace"][:-1]), out["trace"]
    # sf0.001 measured: n_probe=2 → 0.792, 4 → 1.0; doubling lands on 4
    assert out["n_probe"] <= 4


def test_recall_at_k_agrees_with_python_reference(ann_fixture):
    """The distributed recall metric must equal the collect-and-set
    arithmetic the earlier gates use."""
    from zoom_etl_spark.dedup.tune import brute_force_topk, recall_at_k
    corpus, queries, tsets = ann_fixture
    approx = ann_topk_lsh(corpus, queries, "vec_id", "embedding", DIM,
                          k=K, n_planes=4, n_flip=2)
    truth = brute_force_topk(corpus, queries, "vec_id", "embedding", k=K)
    assert abs(recall_at_k(approx, truth) - _recall(approx, tsets)) < 1e-9


def test_ivf_probe_recall(ann_fixture):
    corpus, queries, tsets = ann_fixture
    r2 = _recall(ann_topk_ivf(corpus, queries, "vec_id", "embedding", DIM,
                              k=K, n_cells=16, n_probe=2), tsets)
    r4 = _recall(ann_topk_ivf(corpus, queries, "vec_id", "embedding", DIM,
                              k=K, n_cells=16, n_probe=4), tsets)
    # measured 0.792 / 1.0 on sf0.001
    assert r2 >= 0.70, r2
    assert r4 >= 0.95, r4
    assert r2 <= r4


def test_ivf_reassignment_rate_falls_as_training_converges(spark, sf_dir):
    """ROADMAP 4 done-gate: on a stable corpus, the fraction of rows that
    change cells between successive Lloyd's iterations must fall — the
    maintenance signal that re-training has stopped paying."""
    from zoom_etl_spark.dedup.ivf import (reassignment_rate,
                                          train_centroids_history)

    corpus = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    hist = train_centroids_history(corpus, "embedding", DIM, k=8, iters=5,
                                   seed=42)
    rates = [reassignment_rate(corpus, "embedding", hist[i], hist[i + 1])
             for i in range(len(hist) - 1)]
    assert len(rates) == 4
    # converging: the late rate is below the early rate and small in
    # absolute terms (deterministic seed → stable floor with headroom)
    assert rates[-1] <= rates[0]
    assert rates[-1] <= 0.10, rates
    assert all(0.0 <= r <= 1.0 for r in rates)


def test_ivf_scaling_trace_records_recall_latency_per_size(spark, sf_dir):
    """The per-corpus-size trace is reproducible (hash-sliced, not
    sampled), monotone in rows, and meets the recall target at every
    size on the seeded corpus."""
    from zoom_etl_spark.dedup.tune import ivf_scaling_trace

    corpus = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = corpus.limit(20)
    trace = ivf_scaling_trace(corpus, queries, "vec_id", "embedding", DIM,
                              k=5, n_cells=8, target_recall=0.8,
                              fractions=(0.5, 1.0), iters=2)
    assert [t["fraction"] for t in trace] == [0.5, 1.0]
    assert trace[0]["rows"] < trace[1]["rows"] == corpus.count()
    for t in trace:
        assert t["met"] and t["recall"] >= 0.8
        assert t["seconds"] > 0 and t["n_probe"] >= 1
    # determinism: same slice, same numbers
    again = ivf_scaling_trace(corpus, queries, "vec_id", "embedding", DIM,
                              k=5, n_cells=8, target_recall=0.8,
                              fractions=(0.5,), iters=2)
    assert again[0]["rows"] == trace[0]["rows"]
    assert again[0]["recall"] == trace[0]["recall"]


def test_ivfpq_recall_and_refine_monotone(ann_fixture):
    """IVF-PQ quality gates: (a) with exact-rerank refinement the
    pipeline must track plain IVF closely at the same probe setting —
    PQ may only lose candidates ranked outside the ADC shortlist;
    (b) recall is monotone in the refine factor (longer shortlist ⊇
    shorter one after the same ADC ranking)."""
    from zoom_etl_spark.dedup.pq import ann_topk_ivfpq

    corpus, queries, tsets = ann_fixture
    r_small = _recall(
        ann_topk_ivfpq(corpus, queries, "vec_id", "embedding", DIM, k=K,
                       n_cells=16, n_probe=4, m=16, ks=32, refine=2), tsets)
    r_big = _recall(
        ann_topk_ivfpq(corpus, queries, "vec_id", "embedding", DIM, k=K,
                       n_cells=16, n_probe=4, m=16, ks=32, refine=4), tsets)
    assert r_small <= r_big + 1e-9, (r_small, r_big)
    # plain IVF at n_probe=4 measured 1.0 on sf0.001; PQ at m=16/ks=32
    # measured 0.910 (numpy replica agrees exactly) — floor with headroom
    assert r_big >= 0.85, r_big


def test_opq_rotation_structure(spark, sf_dir):
    """The OPQ rotation must be orthonormal (cosine/L2 preserved exactly
    — the property that lets it prepend ANY distance-based index
    unchanged) and its greedy eigenvalue allocation must balance
    per-subspace variance AT LEAST as well as naive sequential PCA
    ordering (the provable claim; whether PCA beats the RAW axes depends
    on the spectrum — near-isotropic corpora gain nothing, which is why
    quantization_mse, not spread-vs-raw, is the end gate)."""
    import numpy as np

    from zoom_etl_spark.dedup.pq import rotate_embeddings, train_opq_rotation

    corpus = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    M = 8
    R = train_opq_rotation(corpus, "embedding", DIM, m=M)
    assert np.abs(R.T @ R - np.eye(DIM)).max() < 1e-8

    pdf = corpus.limit(512).toPandas()
    E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ER = E @ R
    # pairwise L2 preserved (spot-check the first 50×50 block)
    d0 = ((E[:50, None, :] - E[None, :50, :]) ** 2).sum(axis=2)
    d1 = ((ER[:50, None, :] - ER[None, :50, :]) ** 2).sum(axis=2)
    assert np.abs(d0 - d1).max() < 1e-7

    def spread(X):
        v = X.var(axis=0)
        per = [np.log(np.maximum(v[j * (DIM // M):(j + 1) * (DIM // M)],
                                 1e-12)).sum() for j in range(M)]
        return max(per) - min(per)

    # sequential PCA baseline: same basis, eigenvalue-DESC chunk order
    C = np.cov(np.stack(corpus.limit(4096).toPandas()["embedding"]
                        .to_numpy()).astype(np.float64), rowvar=False)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1]
    E_seq = E @ vecs[:, order]
    assert spread(ER) <= spread(E_seq) + 1e-9

    # the distributed rotation UDF agrees with the driver-side matmul
    rot = rotate_embeddings(corpus.limit(8), "embedding", R)
    got = np.stack(rot.toPandas()["embedding"].to_numpy())
    want = np.stack(corpus.limit(8).toPandas()["embedding"].to_numpy()) @ R
    assert np.abs(got - want).max() < 1e-9


def test_opq_improves_quantization_and_keeps_recall(ann_fixture):
    """OPQ's point: PQ reconstruction MSE must not degrade under the
    rotation (it balances what each subspace's fixed codeword budget has
    to encode), and end-to-end recall with opq=True must hold the same
    floor as the unrotated pipeline."""
    from zoom_etl_spark.dedup.ivf import train_centroids
    from zoom_etl_spark.dedup.pq import (ann_topk_ivfpq, quantization_mse,
                                         rotate_embeddings,
                                         train_opq_rotation,
                                         train_pq_codebooks)

    corpus, queries, tsets = ann_fixture
    M, KS = 16, 32
    cen = train_centroids(corpus, "embedding", DIM, 16, 3, 42)
    books = train_pq_codebooks(corpus, "embedding", DIM, cen, M, KS, seed=42)
    mse_raw = quantization_mse(corpus, "embedding", cen, books)

    R = train_opq_rotation(corpus, "embedding", DIM, m=M)
    rcorp = rotate_embeddings(corpus, "embedding", R)
    cen_r = train_centroids(rcorp, "embedding", DIM, 16, 3, 42)
    books_r = train_pq_codebooks(rcorp, "embedding", DIM, cen_r, M, KS,
                                 seed=42)
    mse_rot = quantization_mse(rcorp, "embedding", cen_r, books_r)
    assert mse_rot <= mse_raw * 1.05, (mse_rot, mse_raw)

    r_opq = _recall(
        ann_topk_ivfpq(corpus, queries, "vec_id", "embedding", DIM, k=K,
                       n_cells=16, n_probe=4, m=M, ks=KS, refine=4,
                       opq=True), tsets)
    assert r_opq >= 0.85, r_opq


def test_opq_iterative_refinement_monotone(spark, sf_dir):
    """Full OPQ coordinate descent: the quantization-MSE trace must be
    non-increasing across rounds (warm-started Lloyd's + Procrustes are
    both descent steps), the final R must stay orthonormal, and the
    refined MSE must beat or match the one-shot PCA-initialized
    codebooks."""
    import numpy as np

    from zoom_etl_spark.dedup.ivf import train_centroids
    from zoom_etl_spark.dedup.pq import refine_opq_rotation

    corpus = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cen = train_centroids(corpus, "embedding", DIM, 16, 3, 42)
    R, books, trace = refine_opq_rotation(corpus, "embedding", DIM, cen,
                                          m=16, ks=32, n_iter=4, seed=42)
    assert np.abs(R.T @ R - np.eye(DIM)).max() < 1e-8
    assert books.shape == (16, 32, DIM // 16)
    assert len(trace) == 4
    for a, b in zip(trace, trace[1:]):
        assert b <= a + 1e-9, trace
    assert trace[-1] <= trace[0] + 1e-9
