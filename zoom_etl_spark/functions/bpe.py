"""Distributed BPE (byte-pair-encoding) merge training (Sennrich et al.
2016) — the tokenizer-training step of an LLM data pipeline, in the
standard distributed formulation: the corpus scan reduces to a
(word, freq) vocabulary ONCE; every merge iteration is a map-combined
pair-count over the vocabulary weighted by word frequency, a 1-row
argmax collect, and a row-local merge application. The corpus is
touched exactly once regardless of the number of merges.

Scale posture: the only corpus-sized operation is the initial word
count (one shuffle, map-side combined). The iteration state is
vocabulary-sized — at 100 TB the vocabulary is millions of rows where
the corpus is trillions, so the loop runs on a frame ~10⁶× smaller
than the data. Pair counting per iteration is one vocabulary-keyed
aggregate; the argmax is a driver-side single row (the same bounded
collect shape as dedup/ivf.py centroids). Lineage is truncated with
localCheckpoint every few merges, the dedup/cluster.py iterative
lesson.

Merge application is the standard leftmost-nonoverlapping scan,
expressed as a fold (``F.aggregate``) over each word's token array —
interpreted, but over vocabulary-sized input only. Correctness is
gated by EXACT equivalence with a pure-Python reference implementation
(tests/test_bpe.py), not an oracle: the loop is iterative and
data-dependent, outside ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) vocabulary with each word pre-split into its initial
    character tokens + end-of-word marker. The one corpus-sized pass."""
    words = (df.select(F.explode(F.filter(F.split(text_col, " "),
                                          lambda x: x != "")).alias("word"))
             .groupBy("word").agg(F.count("*").alias("freq")))
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)))
    return words.select(
        "word", "freq",
        F.concat(chars, F.array(F.lit(END))).alias("toks"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """freq-weighted counts of ADJACENT token pairs across the vocab."""
    idx = F.sequence(F.lit(1), F.size("toks") - 1)
    pairs = vocab.select(
        "freq",
        F.explode(F.transform(
            idx, lambda i: F.struct(
                F.element_at("toks", i).alias("left"),
                F.element_at("toks", i + 1).alias("right")))).alias("p"))
    return (pairs.groupBy(F.col("p.left").alias("left"),
                          F.col("p.right").alias("right"))
            .agg(F.sum("freq").alias("cnt")))


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Replace leftmost-nonoverlapping adjacent (left, right) with the
    merged token — the standard BPE application order, as a fold."""
    a, b = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    folded = F.aggregate(
        F.col("toks"),
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (t == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged))
        ).otherwise(F.concat(acc, F.array(t))))
    return vocab.withColumn("toks", folded)


def train_bpe(df: DataFrame, text_col: str, n_merges: int = 10,
              checkpoint_every: int = 4) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, count)] in
    merge order. Argmax tiebreak is (count DESC, left, right) so the
    result is deterministic under any partitioning."""
    vocab = word_vocab(df, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for step in range(n_merges):
        top = (_pair_counts(vocab)
               .orderBy(F.desc("cnt"), "left", "right").limit(1).collect())
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        if cnt < 2:  # nothing left worth merging
            break
        merges.append((left, right, cnt))
        vocab = _apply_merge(vocab, left, right)
        if (step + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges


def train_bpe_reference(texts: list[str], n_merges: int = 10
                        ) -> list[tuple[str, str, int]]:
    """Pure-Python reference BPE trainer (Sennrich et al. 2016 fig. 1
    shape) for the equivalence gate — same tiebreak, same application
    order, no Spark."""
    from collections import Counter
    words = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) + [END] for w in words}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, toks in vocab.items():
            f = words[w]
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        for w, toks in vocab.items():
            out: list[str] = []
            for t in toks:
                if out and out[-1] == left and t == right:
                    out[-1] = left + right
                else:
                    out.append(t)
            vocab[w] = out
    return merges


def encode_words(words: DataFrame,
                 merges: list[tuple[str, str, int]]) -> DataFrame:
    """Encode each distinct ``word`` with a trained merge table: char
    split + end-of-word marker, then every merge applied in rank order
    (the leftmost-nonoverlapping fold of ``_apply_merge``). Returns
    (word, toks). Vocabulary-sized work — the production encode shape
    tokenizes the VOCABULARY, never the corpus."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)))
    out = words.select(
        "word", F.concat(chars, F.array(F.lit(END))).alias("toks"))
    for left, right, _ in merges:
        out = _apply_merge(out, left, right)
    return out


def encode_bpe(df: DataFrame, text_col: str, id_col: str,
               merges: list[tuple[str, str, int]]) -> DataFrame:
    """Tokenize a corpus with a trained BPE merge table: distinct words
    encode ONCE (:func:`encode_words`), then broadcast-join back onto
    each document's word sequence and flatten in word order. Returns
    (id, toks array<string>, n_tok). Corpus cost is one scan + one
    broadcast probe; all merge work is vocabulary-sized.

    At 100 TB the word→tokens map outgrows a broadcast for open
    vocabularies — the same control flow then shuffles on the word key
    (a plain equi-join); nothing else changes."""
    words = (df.select(F.explode(F.filter(F.split(text_col, " "),
                                          lambda x: x != "")).alias("word"))
               .distinct())
    enc = encode_words(words, merges)
    seq = df.select(
        F.col(id_col),
        F.posexplode(F.filter(F.split(text_col, " "), lambda x: x != ""))
         .alias("pos", "word"))
    joined = seq.join(F.broadcast(enc), "word")
    per_doc = (joined.groupBy(id_col)
               .agg(F.flatten(
                        F.transform(
                            F.sort_array(F.collect_list(
                                F.struct("pos", "toks"))),
                            lambda s: s["toks"])).alias("toks")))
    return per_doc.withColumn("n_tok", F.size("toks"))


def encode_bpe_reference(text: str,
                         merges: list[tuple[str, str, int]]) -> list[str]:
    """Pure-Python reference encoder for the equivalence gate — same
    split, same END marker, same leftmost-nonoverlapping application."""
    out_all: list[str] = []
    for w in text.split(" "):
        if not w:
            continue
        toks = list(w) + [END]
        for left, right, _ in merges:
            out: list[str] = []
            for t in toks:
                if out and out[-1] == left and t == right:
                    out[-1] = left + right
                else:
                    out.append(t)
            toks = out
        out_all.extend(toks)
    return out_all
