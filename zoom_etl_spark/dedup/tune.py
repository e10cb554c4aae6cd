"""Recall-targeted auto-tuning for the ANN operators (ROADMAP item 4).

Picks the cheapest probe setting (LSH ``n_flip`` / IVF ``n_probe``) whose
measured recall@k on a bounded query sample meets a target, instead of
asking users to hand-tune index parameters. The knobs are monotone —
multi-probe candidate sets are supersets (lsh.py), more IVF cells probed
is a superset (ivf.py) — so the first setting to reach the target is
optimal and linear scan-up terminates early.

Scale posture: truth is brute force over (sample × corpus) — bounded by
the sample size, which is the standard way ANN indexes are calibrated at
any corpus size (tune on a sample, serve with the chosen setting). Recall
is computed with a DataFrame join; only the final scalar hits the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from ..operators.windows import topk_per_group
from .ivf import ann_topk_ivf
from .lsh import ann_topk_lsh


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     emb_col: str, k: int = 10) -> DataFrame:
    """Exact cosine top-k per query (the recall ground truth). Cross join
    is deliberate: queries is a bounded calibration sample."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(emb_col).alias("c_emb"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(emb_col).alias("q_emb"))
    cand = (q.crossJoin(c)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", F.round(cosine_similarity("q_emb", "c_emb"), 6)))
    return topk_per_group(
        cand.select("query_id", "neighbor_id", "sim"), keys=["query_id"],
        order=[F.col("sim").desc(), F.col("neighbor_id").asc()], k=k)


def recall_at_k(approx: DataFrame, truth: DataFrame) -> float:
    """Mean per-query |approx ∩ truth| / |truth| — one semi-join + two
    tiny aggregates; no per-row driver loop."""
    hits = (truth.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id").agg(F.count("*").alias("n_hit")))
    per_q = (truth.groupBy("query_id").agg(F.count("*").alias("n_true"))
             .join(hits, "query_id", "left")
             .select((F.coalesce("n_hit", F.lit(0)) / F.col("n_true"))
                     .alias("recall")))
    row = per_q.agg(F.avg("recall")).first()
    return float(row[0]) if row[0] is not None else 0.0


def tune_lsh_flips(corpus: DataFrame, queries: DataFrame, id_col: str,
                   emb_col: str, dim: int, k: int = 10, n_planes: int = 8,
                   target_recall: float = 0.9, max_flip: int | None = None,
                   seed: int = 42) -> dict:
    """Smallest ``n_flip`` whose recall@k ≥ target (or the max tried, with
    ``met=False``). Returns {n_flip, recall, met, trace}."""
    max_flip = n_planes if max_flip is None else max_flip
    truth = brute_force_topk(corpus, queries, id_col, emb_col, k).persist()
    trace: list[tuple[int, float]] = []
    best = (max_flip, 0.0)
    for n_flip in range(0, max_flip + 1):
        r = recall_at_k(ann_topk_lsh(corpus, queries, id_col, emb_col, dim,
                                     k=k, n_planes=n_planes, seed=seed,
                                     n_flip=n_flip), truth)
        trace.append((n_flip, r))
        best = (n_flip, r)
        if r >= target_recall:
            break
    truth.unpersist()
    return {"n_flip": best[0], "recall": best[1],
            "met": best[1] >= target_recall, "trace": trace}


def tune_ivf_probes(corpus: DataFrame, queries: DataFrame, id_col: str,
                    emb_col: str, dim: int, k: int = 10, n_cells: int = 16,
                    target_recall: float = 0.9, max_probe: int | None = None,
                    iters: int = 2, seed: int = 42) -> dict:
    """Smallest ``n_probe`` whose recall@k ≥ target. Doubles the probe
    count each step (recall is monotone; doubling keeps the scan-up to
    O(log n_cells) index builds... the index itself is built once per
    setting here only because ann_topk_ivf is end-to-end; a served index
    would be built once and re-probed)."""
    max_probe = n_cells if max_probe is None else max_probe
    truth = brute_force_topk(corpus, queries, id_col, emb_col, k).persist()
    trace: list[tuple[int, float]] = []
    n_probe, best = 1, (1, 0.0)
    while True:
        r = recall_at_k(ann_topk_ivf(corpus, queries, id_col, emb_col, dim,
                                     k=k, n_cells=n_cells, n_probe=n_probe,
                                     iters=iters, seed=seed), truth)
        trace.append((n_probe, r))
        best = (n_probe, r)
        if r >= target_recall or n_probe >= max_probe:
            break
        n_probe = min(n_probe * 2, max_probe)
    truth.unpersist()
    return {"n_probe": best[0], "recall": best[1],
            "met": best[1] >= target_recall, "trace": trace}


def ivf_scaling_trace(corpus: DataFrame, queries: DataFrame, id_col: str,
                      emb_col: str, dim: int, k: int = 10, n_cells: int = 16,
                      target_recall: float = 0.9,
                      fractions: tuple[float, ...] = (0.25, 0.5, 1.0),
                      iters: int = 2, seed: int = 42) -> list[dict]:
    """Recall/latency trace per corpus size (ROADMAP item 4): tune the
    IVF probe count at successive deterministic slices of the corpus and
    record {rows, n_probe, recall, met, seconds} for each. The trace is
    what an index-maintenance job plots to answer "is recall drifting as
    the corpus grows, and what does restoring it cost?" — if n_probe (or
    latency) must rise superlinearly with corpus size, n_cells needs to
    scale up at the next re-train (IVF cells should track ~sqrt(n)).

    Slices are hash-deterministic (pmod over the id), not sample():
    re-running the trace on an unchanged corpus reproduces it exactly,
    so successive runs are comparable — the point of a maintenance
    metric."""
    import time

    out: list[dict] = []
    for frac in fractions:
        keep = max(1, round(frac * 100))
        sub = (corpus if keep >= 100 else
               corpus.filter(F.pmod(F.xxhash64(F.col(id_col)),
                                    F.lit(100)) < keep))
        n_rows = sub.count()
        t0 = time.monotonic()
        tuned = tune_ivf_probes(sub, queries, id_col, emb_col, dim, k=k,
                                n_cells=n_cells, target_recall=target_recall,
                                iters=iters, seed=seed)
        out.append({"fraction": frac, "rows": n_rows,
                    "n_probe": tuned["n_probe"], "recall": tuned["recall"],
                    "met": tuned["met"],
                    "seconds": round(time.monotonic() - t0, 3)})
    return out
