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
