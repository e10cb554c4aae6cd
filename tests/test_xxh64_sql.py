"""XXH64-in-SQL (suite/xxh64_sql.py): the generated DuckDB expressions
must reproduce Spark's xxhash64 EXACTLY — strings at every length
crossing the stripe/word/chunk/byte boundaries, longs across the
signed range, and the chained int+long shapes the minhash pipeline
uses — plus the loud max-length overflow contract. A pure-Python
reference implements the spec a third way so a Spark-side and a
SQL-side bug can't cancel."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from zoom_etl_spark.suite.xxh64_sql import (SEED, Steps, from_signed, h,
                                            hash_int_staged,
                                            hash_long_staged,
                                            hash_string_staged, to_signed)

M = (1 << 64) - 1
P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(hv):
    hv ^= hv >> 33
    hv = (hv * P2) & M
    hv ^= hv >> 29
    hv = (hv * P3) & M
    return hv ^ (hv >> 32)


def ref_long(value, seed):
    value &= M
    hv = (seed + P5 + 8) & M
    k1 = (_rotl((value * P2) & M, 31) * P1) & M
    hv ^= k1
    hv = (_rotl(hv, 27) * P1 + P4) & M
    return _fmix(hv)


def ref_int(value, seed):
    hv = (seed + P5 + 4) & M
    hv ^= ((value & 0xFFFFFFFF) * P1) & M
    hv = (_rotl(hv, 23) * P2 + P3) & M
    return _fmix(hv)


def ref_bytes(b, seed):
    ln = len(b)
    i = 0
    if ln >= 32:
        v = [(seed + P1 + P2) & M, (seed + P2) & M, seed & M,
             (seed - P1) & M]
        while i + 32 <= ln:
            for k in range(4):
                lane = int.from_bytes(b[i + 8 * k:i + 8 * k + 8], "little")
                v[k] = (_rotl((v[k] + lane * P2) & M, 31) * P1) & M
            i += 32
        hv = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12)
              + _rotl(v[3], 18)) & M
        for vk in v:
            hv ^= (_rotl((vk * P2) & M, 31) * P1) & M
            hv = (hv * P1 + P4) & M
    else:
        hv = (seed + P5) & M
    hv = (hv + ln) & M
    while i + 8 <= ln:
        w = int.from_bytes(b[i:i + 8], "little")
        hv ^= (_rotl((w * P2) & M, 31) * P1) & M
        hv = (_rotl(hv, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= ln:
        w = int.from_bytes(b[i:i + 4], "little")
        hv ^= (w * P1) & M
        hv = (_rotl(hv, 23) * P2 + P3) & M
        i += 4
    while i < ln:
        hv ^= (b[i] * P5) & M
        hv = (_rotl(hv, 11) * P1) & M
        i += 1
    return _fmix(hv)


def _signed(hv):
    return hv - (1 << 64) if hv >= (1 << 63) else hv


BOUNDARY_STRS = ["", "a", "abc"] + [
    "".join(random.Random(n).choice("abcdefghij klmnop-_.!0123456789")
            for _ in range(n))
    for n in list(range(4, 50)) + [63, 64, 65, 95, 96, 97, 100, 120, 127]]
LONGS = [0, 1, -1, 42, 123456789012345, -987654321098765,
         2**63 - 1, -2**63]


def test_sql_matches_python_reference_on_strings():
    con = duckdb.connect()
    con.register("t0", pd.DataFrame({"s": BOUNDARY_STRS}))
    con.execute("CREATE TABLE t AS SELECT s FROM t0")
    s = Steps()
    hv = hash_string_staged(s, "s", max_len=127)
    rows = con.execute(
        f"SELECT s, {to_signed(hv)} FROM "
        f"({s.render_nested('SELECT s FROM t')})").fetchall()
    assert len(rows) == len(BOUNDARY_STRS)
    for text, got in rows:
        assert got == _signed(ref_bytes(text.encode(), SEED)), repr(text)


def test_sql_matches_python_reference_on_long_chains():
    con = duckdb.connect()
    con.register("t0", pd.DataFrame({"l": pd.array(LONGS, dtype="int64")}))
    s = Steps()
    lu = s.add(from_signed("l"))
    salt = hash_int_staged(s, h(7), h(SEED))
    hv = hash_long_staged(s, lu, salt)
    rows = con.execute(
        f"SELECT l, {to_signed(hv)} FROM "
        f"({s.render_nested('SELECT l FROM t0')})").fetchall()
    for val, got in rows:
        assert got == _signed(ref_long(val, ref_int(7, SEED))), val


def test_loud_overflow_contract():
    con = duckdb.connect()
    con.register("t0", pd.DataFrame({"s": ["short", "x" * 40]}))
    s = Steps()
    hv = hash_string_staged(s, "s", max_len=31)
    rows = dict(con.execute(
        f"SELECT s, {to_signed(hv)} FROM "
        f"({s.render_nested('SELECT s FROM t0')})").fetchall())
    assert rows["short"] is not None
    assert rows["x" * 40] is None  # longer than the bound -> loud NULL


@pytest.mark.usefixtures("spark")
def test_python_reference_matches_spark(spark):
    """Close the triangle: the reference itself against F.xxhash64 on
    strings, longs, the salted-perm chain, and the band-key shape."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in BOUNDARY_STRS], "s string")
    for r in df.select("s", F.xxhash64("s").alias("hh")).collect():
        assert r.hh == _signed(ref_bytes(r.s.encode(), SEED)), repr(r.s)
    dl = spark.createDataFrame([(l,) for l in LONGS], "l long")
    got = dl.select(
        "l", F.xxhash64("l").alias("h1"),
        F.xxhash64(F.lit(7), F.col("l")).alias("h2"),
        F.xxhash64(F.lit(3), "l", "l", "l", "l").alias("h3")).collect()
    for r in got:
        assert r.h1 == _signed(ref_long(r.l, SEED))
        assert r.h2 == _signed(ref_long(r.l, ref_int(7, SEED)))
        acc = ref_int(3, SEED)
        for _ in range(4):
            acc = ref_long(r.l, acc)
        assert r.h3 == _signed(acc)


def test_sql_matches_reference_on_random_strings_property():
    """Property sweep: 300 hypothesis-style random printable-ASCII
    strings (seeded, deterministic) of length 0..127 — every one must
    hash identically through the SQL and the Python reference. Catches
    byte-boundary mistakes the curated BOUNDARY_STRS might miss."""
    rng = random.Random(0xC0FFEE)
    alphabet = [chr(c) for c in range(32, 127)]
    strs = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 127)))
            for _ in range(300)]
    con = duckdb.connect()
    con.register("t0", pd.DataFrame({"s": strs}))
    con.execute("CREATE TABLE t AS SELECT s FROM t0")
    s = Steps()
    hv = hash_string_staged(s, "s", max_len=127)
    rows = con.execute(
        f"SELECT s, {to_signed(hv)} FROM "
        f"({s.render_nested('SELECT s FROM t')})").fetchall()
    assert len(rows) == len(strs)
    for text, got in rows:
        assert got == _signed(ref_bytes(text.encode(), SEED)), repr(text)
