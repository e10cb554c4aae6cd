"""XXH64 as generated DuckDB SQL — the oracle-side twin of Spark's
``xxhash64`` (round-8: promoting the last two data-shaped rows-only
queries, `dedup_minhash` / `dedup_simhash`, whose production variants
hash with xxhash64).

Spark's Catalyst ``XxHash64`` expression implements the public-domain
xxHash64 algorithm (Yann Collet, github.com/Cyan4973/xxHash) with seed
42, chaining multi-argument calls: ``xxhash64(a, b)`` computes
``hash(b, seed=hash(a, seed=42))``, where each value hashes by type —
LongType via an 8-byte specialization, IntegerType via a 4-byte one,
StringType over its UTF-8 bytes. DuckDB has no xxhash64, so this
module EMITS the algorithm as SQL text: 64-bit modular arithmetic on
HUGEINT (multiplication via 32-bit limb decomposition — DuckDB raises
on integer overflow, so ``a*b mod 2^64`` must never materialize the
full 128-bit product above HUGEINT range), ``xor()`` for the mixing
steps, and fully unrolled stripe/tail loops for the string hash.

Emission style, chosen to bound SQL text size AND binder/exec cost:
every primitive op becomes ONE NESTED-SELECT LEVEL
(``SELECT *, expr AS xN FROM (...)`` via ``Steps``). Two rejected
alternatives, measured: (a) lateral column aliases — DuckDB expands
them by TEXTUAL SUBSTITUTION, so a chained hash whose steps reference
the previous step 2-3 times explodes exponentially at bind time (an
18-step chain hangs the binder); (b) ``list_reduce`` lambdas for the
variable-length stripe/tail loops — DuckDB 1.0 evaluates large lambda
bodies at ~1 ms/row (17 s for 20k mostly-stripe-free rows), three
orders slower than the same math as projection columns. The string
hash is therefore FULLY UNROLLED to a caller-supplied ``max_len``
byte bound (stripes, tail words, tail bytes — each iteration one
guarded CASE level), with a LOUD overflow contract: a string longer
than ``max_len`` hashes to NULL, which can never value-match Spark —
the multimodal_features generate_series-bound precedent. Nested
subselects bind fast and run vectorized: ~120 stages over 100k rows
in ~1 s.

Every constant below is from the xxHash64 specification; the handful
of precomputed accumulator-init literals (seed-folded primes for
seed=42) are spec arithmetic constant-folded in Python, exactly as the
prime literals themselves are. Validated exactly against BOTH Spark's
``F.xxhash64`` and a pure-Python reference in
tests/test_xxh64_sql.py (string lengths 0..120 crossing every
stripe/word/tail boundary, long/int chains, the salted-perm and
band-key shapes). The CALLERS' ``max_len`` choices are corpus-coupled;
tests/test_oracle_corpus_contract.py re-measures the corpus token and
shingle byte maxima at all three SFs every pytest run and fails if
they approach minhash_oracle.MAX_STR — a testdata regen with longer
strings breaks in pytest, not as all-NULL hash columns at drive time.
"""

from __future__ import annotations

M64 = "18446744073709551616"  # 2^64
P1 = 11400714785074694791  # 0x9E3779B185EBCA87
P2 = 14029467366897019727  # 0xC2B2AE3D27D4EB4F
P3 = 1609587929392839161   # 0x165667B19E3779F9
P4 = 9650029242287828579   # 0x85EBCA77C2B2AE63
P5 = 2870177450012600261   # 0x27D4EB2F165667C5
SEED = 42
_M = (1 << 64) - 1


def mul64(a: str, b: str) -> str:
    """(a*b) mod 2^64 via 32-bit limbs (HUGEINT-safe)."""
    return (f"(((({a}) % 4294967296) * (({b}) % 4294967296)"
            f" + (((({a}) % 4294967296) * (({b}) // 4294967296)"
            f" + (({a}) // 4294967296) * (({b}) % 4294967296))"
            f" % 4294967296) * 4294967296) % {M64})")


def add64(a: str, b: str) -> str:
    return f"((({a}) + ({b})) % {M64})"


def rotl64(x: str, r: int) -> str:
    return (f"(((({x}) * {1 << r}) % {M64})"
            f" + (({x}) // {1 << (64 - r)}))")


def xor64(a: str, b: str) -> str:
    return f"xor(CAST(({a}) AS HUGEINT), CAST(({b}) AS HUGEINT))"


def shr64(x: str, n: int) -> str:
    return f"(({x}) // {1 << n})"


def h(v: int) -> str:
    """HUGEINT literal."""
    return f"CAST({v} AS HUGEINT)"


class Steps:
    """Accumulates staged columns; ``render_nested`` wraps a source
    query in one nested-SELECT level per step so every intermediate is
    a PHYSICAL projection column (computed once per row, referenced by
    binding — never substituted; see module docstring for why lateral
    aliases are unusable here)."""

    def __init__(self, prefix: str = "x"):
        self.prefix = prefix
        self.cols: list[tuple[str, str]] = []

    def add(self, expr: str) -> str:
        name = f"{self.prefix}{len(self.cols)}"
        self.cols.append((name, expr))
        return name

    def render_nested(self, source: str) -> str:
        """Wrap ``source`` (a full SELECT) in one level per step."""
        q = source
        for name, expr in self.cols:
            q = f"SELECT *, {expr} AS {name} FROM ({q})"
        return q


def fmix_staged(s: Steps, hv: str) -> str:
    hv = s.add(xor64(hv, shr64(hv, 33)))
    hv = s.add(mul64(hv, h(P2)))
    hv = s.add(xor64(hv, shr64(hv, 29)))
    hv = s.add(mul64(hv, h(P3)))
    return s.add(xor64(hv, shr64(hv, 32)))


def hash_long_staged(s: Steps, l: str, seed: str) -> str:
    """XXH64 of one 8-byte long value (Spark hashLong), staged."""
    hv = s.add(add64(seed, h((P5 + 8) & _M)))
    k1 = s.add(mul64(l, h(P2)))
    k1 = s.add(rotl64(k1, 31))
    k1 = s.add(mul64(k1, h(P1)))
    hv = s.add(xor64(hv, k1))
    hv = s.add(add64(mul64(rotl64(hv, 27), h(P1)), h(P4)))
    return fmix_staged(s, hv)


def hash_int_staged(s: Steps, i: str, seed: str) -> str:
    """XXH64 of one 4-byte int value (Spark hashInt), staged. ``i``
    must already be the unsigned 32-bit value (0..2^32)."""
    hv = s.add(add64(seed, h((P5 + 4) & _M)))
    hv = s.add(xor64(hv, mul64(i, h(P1))))
    hv = s.add(add64(mul64(rotl64(hv, 23), h(P2)), h(P3)))
    return fmix_staged(s, hv)


def byte_at(col: str, pos: str) -> str:
    """Byte value at 1-based position ``pos`` of ASCII string column
    ``col``; 0 beyond the end (guarded CASE levels never USE those
    values, but DuckDB may evaluate both CASE branches vector-wide, so
    out-of-range access must be total, not an error)."""
    return (f"CAST(ord(coalesce(nullif(substr({col},"
            f" CAST({pos} AS INT), 1), ''), chr(0))) AS HUGEINT)")


def _word64(col: str, pos: str) -> str:
    """Little-endian u64 from 8 bytes at 1-based position ``pos``."""
    return "(" + " + ".join(
        f"{byte_at(col, f'({pos}) + {j}')} * {1 << (8 * j)}"
        for j in range(8)) + ")"


def _word32(col: str, pos: str) -> str:
    return "(" + " + ".join(
        f"{byte_at(col, f'({pos}) + {j}')} * {1 << (8 * j)}"
        for j in range(4)) + ")"


def _lane_staged(s: Steps, v: str, w: str) -> str:
    """One stripe lane update, staged: rotl(v + w*P2, 31) * P1."""
    k = s.add(mul64(w, h(P2)))
    k = s.add(add64(v, k))
    k = s.add(rotl64(k, 31))
    return s.add(mul64(k, h(P1)))


def hash_string_staged(s: Steps, col: str, max_len: int,
                       seed: int = SEED) -> str:
    """XXH64 over the UTF-8 bytes of ASCII string column ``col``
    (Spark hashUnsafeBytes semantics), staged and FULLY UNROLLED to
    ``max_len`` bytes. Strings longer than ``max_len`` hash to NULL —
    a loud oracle failure, never a silent wrong hash. The corpus
    contract (printable ASCII, pinned by the multimodal oracles) makes
    byte == codepoint, so ord(substr(...)) IS the byte."""
    ln = s.add(f"CAST(length({col}) AS HUGEINT)")
    ns = s.add(f"(({ln}) // 32)")  # full 32-byte stripes
    n_stripes = max_len // 32
    # --- stripe loop, unrolled: guarded accumulator updates
    vs = [s.add(h((seed + P1 + P2) & _M)), s.add(h((seed + P2) & _M)),
          s.add(h(seed & _M)), s.add(h((seed - P1) & _M))]
    for t in range(n_stripes):
        for k in range(4):
            upd = _lane_staged(s, vs[k], _word64(col, f"{32 * t + 8 * k + 1}"))
            vs[k] = s.add(f"CASE WHEN {ns} >= {t + 1} THEN {upd}"
                          f" ELSE {vs[k]} END")
    # combine (len >= 32) or seed+P5 (len < 32)
    c12 = s.add(add64(rotl64(vs[0], 1), rotl64(vs[1], 7)))
    c34 = s.add(add64(rotl64(vs[2], 12), rotl64(vs[3], 18)))
    comb = s.add(add64(c12, c34))
    hv = s.add(f"CASE WHEN {ln} >= 32 THEN {comb}"
               f" ELSE {h((seed + P5) & _M)} END")
    for k in range(4):
        m = s.add(mul64(vs[k], h(P2)))
        m = s.add(rotl64(m, 31))
        m = s.add(mul64(m, h(P1)))
        m = s.add(xor64(hv, m))
        m = s.add(add64(mul64(m, h(P1)), h(P4)))
        hv = s.add(f"CASE WHEN {ln} >= 32 THEN {m} ELSE {hv} END")
    hv = s.add(add64(hv, ln))
    # --- tail 8-byte words (at most 3 after the last full stripe)
    nw = s.add(f"((({ln}) - 32 * ({ns})) // 8)")
    for w in range(3):
        word = _word64(col, f"32 * ({ns}) + {8 * w} + 1")
        k1 = s.add(mul64(word, h(P2)))
        k1 = s.add(rotl64(k1, 31))
        k1 = s.add(mul64(k1, h(P1)))
        m = s.add(xor64(hv, k1))
        m = s.add(add64(mul64(rotl64(m, 27), h(P1)), h(P4)))
        hv = s.add(f"CASE WHEN {nw} >= {w + 1} THEN {m} ELSE {hv} END")
    # --- 4-byte chunk if >= 4 bytes remain
    off4 = s.add(f"(32 * ({ns}) + 8 * ({nw}))")  # bytes consumed
    rem4 = s.add(f"(({ln}) - ({off4}))")
    m = s.add(xor64(hv, mul64(_word32(col, f"({off4}) + 1"), h(P1))))
    m = s.add(add64(mul64(rotl64(m, 23), h(P2)), h(P3)))
    hv = s.add(f"CASE WHEN {rem4} >= 4 THEN {m} ELSE {hv} END")
    off1 = s.add(f"CASE WHEN {rem4} >= 4 THEN ({off4}) + 4"
                 f" ELSE ({off4}) END")
    # --- remaining single bytes (at most 3 after the 4-byte chunk...
    # or up to 7 when no 4-byte chunk fit; unroll 7 to be total)
    for b in range(7):
        m = s.add(xor64(hv, mul64(byte_at(col, f"({off1}) + {b} + 1"),
                                  h(P5))))
        m = s.add(mul64(rotl64(m, 11), h(P1)))
        hv = s.add(f"CASE WHEN ({ln}) - ({off1}) >= {b + 1} THEN {m}"
                   f" ELSE {hv} END")
    hv = fmix_staged(s, hv)
    # loud overflow contract (see docstring)
    return s.add(f"CASE WHEN {ln} > {max_len} THEN NULL ELSE {hv} END")


def to_signed(hv: str) -> str:
    """[0, 2^64) HUGEINT -> Spark's signed BIGINT."""
    return (f"CAST(CASE WHEN ({hv}) >= 9223372036854775808"
            f" THEN ({hv}) - {M64} ELSE ({hv}) END AS BIGINT)")


def from_signed(col: str) -> str:
    """Signed BIGINT column -> [0, 2^64) HUGEINT."""
    return (f"(CASE WHEN CAST({col} AS HUGEINT) < 0"
            f" THEN CAST({col} AS HUGEINT) + {M64}"
            f" ELSE CAST({col} AS HUGEINT) END)")
