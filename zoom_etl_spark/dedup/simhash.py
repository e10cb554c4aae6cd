"""SimHash (64-bit) document fingerprints, pure SQL expressions.

Per doc: hash each token to 64 bits; for every bit position sum +1/-1
over token hashes; the sign vector packed into a BIGINT is the simhash.
Near-dups have small Hamming distance (checked with bit_count(a ^ b)).
Expressed as nested higher-order functions over the token-hash array —
one pass, JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .minhash import tokens

# SQL-text lambda (not Column lambda) because shiftright's shift amount is
# the *outer* lambda variable — easiest expressed in raw SQL.
# shiftleft (not acc*2) — the 64th bit wraps into the sign bit, which ANSI
# multiplication rejects as overflow but bitwise shift permits.
_PACK_BITS = (
    "aggregate(sequence(0, 63), 0L, (acc, b) -> shiftleft(acc, 1) + "
    " (CASE WHEN aggregate({hashes}, 0L, (s, h) -> s + "
    "   CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END) >= 0 "
    "  THEN 1L ELSE 0L END))"
)


def with_simhash(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    """Attach a 64-bit simhash column computed from ``text_col``."""
    tmp = df.withColumn("__sh_hashes",
                        F.transform(tokens(text_col), lambda t: F.xxhash64(t)))
    return (tmp.withColumn(out_col, F.expr(_PACK_BITS.format(hashes="__sh_hashes")))
            .drop("__sh_hashes"))


def hamming_distance(a, b):
    """Hamming distance between two simhash BIGINT columns."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))
