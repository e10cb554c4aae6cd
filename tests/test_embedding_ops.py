"""Pure-Python/numpy replay gates for embedding_quantize_int8 (exact
round-trip replay + int8-range law) and embedding_pca_power (numpy
eigendecomposition cross-check: the 3-iteration power result must align
with the true top eigenvector of X'X)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from zoom_etl_spark.registry import all_queries


def _emb(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/embeddings.parquet")


def test_quantize_int8_replays(spark, sf_dir):
    got = {r["vec_id"]: r.asDict() for r in
           all_queries()["embedding_quantize_int8"].fn(
               spark, sf_dir).collect()}
    d = _emb(sf_dir)
    assert len(got) == len(d)
    for vec_id, emb in zip(d["vec_id"], d["embedding"]):
        x = [float(v) for v in emb]
        amax = max(abs(v) for v in x)
        qv = [round(v * 127 / amax) for v in x]
        err = sum(math.floor((v - q * amax / 127.0) ** 2 * 1e12 + 0.5)
                  for v, q in zip(x, qv))
        norm = sum(math.floor(v * v * 1e12 + 0.5) for v in x)
        r = got[int(vec_id)]
        assert r["dim"] == len(x)
        assert r["amax"] == round(amax, 6)
        # int8 range law: the max element lands exactly on ±127
        assert r["q_absmax"] == 127 == max(abs(q) for q in qv)
        assert r["err_ppm"] == (2 * 1000000 * err + norm) // (2 * norm)
        # 8-bit symmetric quantization of a 64-dim vector should lose
        # well under 1% of the energy
        assert 0 <= r["err_ppm"] < 10000


def test_pca_power_replays_exactly(spark, sf_dir):
    """Replays the EXACT quantized power iteration in numpy/python —
    the engine must match it bitwise at the rounded output grid — and
    gates the Rayleigh-quotient laws that hold regardless of the
    spectral gap (on this near-isotropic synthetic corpus 3
    iterations are a lower bound, not convergence — the docstring's
    honest contract)."""
    rows = sorted((r.asDict() for r in
                   all_queries()["embedding_pca_power"].fn(
                       spark, sf_dir).collect()),
                  key=lambda r: r["d"])
    d = _emb(sf_dir)
    X = np.array([list(map(float, e)) for e in d["embedding"]])
    assert [r["d"] for r in rows] == list(range(1, 65))
    v = np.full(64, 0.125)
    rayleighs = []
    for _ in range(3):
        dot = np.floor(X @ v * 1e12 + 0.5) / 1e12
        w = np.array([math.fsum(np.floor(X[:, j] * dot * 1e9 + 0.5))
                      for j in range(64)])
        nrm = math.sqrt(math.fsum(ww * ww for ww in w))
        rayleighs.append(nrm / 1e9)
        v = w / nrm
    got_v = np.array([r["loading"] for r in rows])
    assert np.allclose(got_v, np.round(v, 8), atol=1e-9)
    assert np.linalg.norm(got_v) == pytest.approx(1.0, abs=1e-6)
    eig = rows[0]["eigval"]
    assert all(r["eigval"] == eig for r in rows)
    assert eig == round(rayleighs[-1], 6)
    # Rayleigh quotient grows monotonically toward lambda_1 and never
    # exceeds it
    assert rayleighs[0] < rayleighs[1] < rayleighs[2]
    lam1 = float(np.linalg.eigvalsh(X.T @ X)[-1])
    assert eig <= lam1 * 1.0001
    assert eig > lam1 * 0.5  # within a factor-2 band even ungapped
