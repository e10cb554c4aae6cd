"""SimHash (64-bit) document fingerprints.

Per doc: hash each token to 64 bits; for every bit position sum +1/-1
over token hashes; the sign vector packed into a BIGINT is the simhash.
Near-dups have small Hamming distance (checked with bit_count(a ^ b)).

Physical shape: explode token hashes → one hash aggregate with 64
codegen'd conditional sums → pack. An interpreted nested-HOF fold
(aggregate over sequence(0,63) × tokens) does the same math ~7× slower;
the explode adds one shuffle on doc_id but stays inside whole-stage
codegen — the right trade at any scale, since the aggregate is partial
(map-side combine shrinks the shuffle to one row per doc per mapper).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .minhash import tokens


def _bit_sums():
    """64 conditional-sum aggregate expressions, one per bit position.
    NULL h (empty doc kept by explode_outer) contributes 0 ⇒ sum 0 ⇒ the
    bit reads 1, matching the fold definition for zero tokens."""
    return [
        F.sum(F.when(F.col("h").isNull(), 0)
               .when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), 1)
               .otherwise(-1)).alias(f"b{b}")
        for b in range(64)
    ]


def _pack_bits():
    """OR together shiftleft(bit_b, 63-b); bit_b = sign(b{b}).
    bitwiseOR (not +) so the sign bit (b=0 → shift 63) wraps legally."""
    terms = [
        F.shiftleft(F.when(F.col(f"b{b}") >= 0, F.lit(1)).otherwise(F.lit(0))
                    .cast("long"), 63 - b)
        for b in range(64)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def with_simhash(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    """Attach a 64-bit simhash column computed from ``text_col``.

    Docs with zero tokens get simhash -1 (explode_outer keeps them as one
    NULL-hash row; all sign sums are 0 ⇒ every bit 1).
    """
    based = df.withColumn("__sh_row", F.monotonically_increasing_id())
    hashes = based.select(
        "__sh_row",
        F.explode_outer(F.transform(tokens(text_col), lambda t: F.xxhash64(t)))
         .alias("h"),
    )
    packed = (hashes.groupBy("__sh_row").agg(*_bit_sums())
              .select("__sh_row", _pack_bits().alias(out_col)))
    return based.join(packed, "__sh_row", "left").drop("__sh_row")


def hamming_distance(a, b):
    """Hamming distance between two simhash BIGINT columns."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))
