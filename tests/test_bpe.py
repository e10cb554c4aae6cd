"""Distributed BPE trainer gates: exact equivalence with the
pure-Python reference (same tiebreaks, same leftmost-nonoverlapping
application), monotone corpus compression, and layout invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from zoom_etl_spark.catalog import table
from zoom_etl_spark.functions.bpe import (train_bpe, train_bpe_reference,
                                          word_vocab, _apply_merge)


def test_bpe_matches_python_reference(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    texts = [r.text for r in d.select("text").collect()]
    ref = train_bpe_reference(texts, n_merges=8)
    got = train_bpe(d, "text", n_merges=8)
    assert got == ref


def test_bpe_layout_invariant(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    a = train_bpe(d, "text", n_merges=5)
    b = train_bpe(d.repartition(13), "text", n_merges=5)
    assert a == b


def test_bpe_merges_shrink_token_count(spark, sf_dir):
    """Each applied merge strictly reduces the freq-weighted corpus
    token count by exactly the merge's pair count."""
    d = table(spark, sf_dir, "documents")
    vocab = word_vocab(d, "text").localCheckpoint()
    total = vocab.select(
        F.sum(F.size("toks") * F.col("freq")).alias("t")).first()["t"]
    for left, right, cnt in train_bpe(d, "text", n_merges=4):
        vocab = _apply_merge(vocab, left, right)
        new_total = vocab.select(
            F.sum(F.size("toks") * F.col("freq")).alias("t")).first()["t"]
        assert new_total == total - cnt, (left, right, cnt)
        total = new_total


def test_encode_bpe_matches_reference(spark, sf_dir):
    """Distributed encode must equal the pure-Python encoder doc-by-doc
    under the merges trained on the same corpus, and detokenization
    (strip END, concat) must reconstruct each document's words."""
    from zoom_etl_spark.functions.bpe import (END, encode_bpe,
                                              encode_bpe_reference,
                                              train_bpe)

    d = table(spark, sf_dir, "documents").limit(120)
    merges = train_bpe(d, "text", n_merges=6)
    assert merges
    got = {r.doc_id: list(r.toks)
           for r in encode_bpe(d, "text", "doc_id", merges).collect()}
    rows = {r.doc_id: r.text for r in d.collect()}
    for doc_id, text in rows.items():
        want = encode_bpe_reference(text, merges)
        assert got[doc_id] == want, doc_id
        # round trip: tokens respell the original words
        respelled = "".join(t for t in want).replace(END, " ").strip()
        assert respelled == " ".join(w for w in text.split(" ") if w)


def test_bpe_train_oracle_models_early_break():
    """The unrolled-CTE oracle (round-8: bpe_train off the rows-only
    ledger) must reproduce the trainer's `break` when the corpus runs
    dry before K merges: each best-CTE's WHERE cnt >= 2 empties that
    round's 1-row frame and the CROSS JOIN cascades every later round
    empty. Checked against the pure-Python reference on a corpus with
    deliberately few mergeable pairs — no Spark needed."""
    import duckdb
    import pandas as pd

    from zoom_etl_spark.functions.bpe import train_bpe_reference
    from zoom_etl_spark.suite.scoring import _bpe_train_oracle

    texts = ["ab ab", "cd"]  # reference stops well before 10 merges
    want = train_bpe_reference(texts, n_merges=10)
    assert 0 < len(want) < 10  # the break path is actually exercised

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": texts}))
    got = [(r[1], r[2], int(r[3])) for r in
           con.execute(_bpe_train_oracle() + " ORDER BY step").fetchall()]
    assert got == want
