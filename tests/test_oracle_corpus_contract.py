"""Corpus-coupled oracle contracts, asserted every pytest run.

Two round-8 oracle families lean on measured properties of the pinned
testdata corpus rather than on properties any corpus would have; both
fail LOUDLY at drive time if violated (NULL hash columns / dropped
tokens), but drive time is late — a testdata regen should fail here,
in pytest, the way tests/test_spatial.py re-asserts the haversine
guard band every run (round-8 verdict item 5).

1. xxh64-in-SQL unroll bound (suite/xxh64_sql.py + minhash_oracle.py):
   the string hash is fully unrolled to MAX_STR=63 bytes and hashes
   longer strings to NULL. The hashed strings are exactly the
   normalized whitespace tokens (simhash vocab, minhash token stream)
   and the k=3 word-shingles (minhash) of documents.text — their byte
   maxima must stay under the bound at every SF.

2. bpe_train / bpe_encode pipe-delimited token encoding
   (suite/scoring.py): corpus words must contain no literal '|' and
   no control characters (RE2 '.' skips newlines, so consecutive
   control chars would fuse tokens).

DuckDB-only (no Spark session): the contract is about the DATA, and
the tokenization is restated with the same expressions the oracles
themselves use (_TOK / the list_slice shingle build), so a drift in
either the corpus or the oracle tokenizer shows up as a delta here.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from zoom_etl_spark.suite.minhash_oracle import _TOK, MAX_STR

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
SHINGLE_K = 3  # dedup_minhash's registered k

sf_param = pytest.mark.parametrize(
    "sf_dir", [pytest.param(d, id=os.path.basename(d)) for d in SF_DIRS
               if os.path.exists(os.path.join(d, "documents.parquet"))])


def _con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    return con


@sf_param
def test_xxh64_unroll_bound_covers_corpus(sf_dir):
    """Token and shingle byte maxima stay under MAX_STR, with at least
    one stripe (32 B) of headroom for shingles — the margin the
    round-8 design note claims (corpus maxima 8/26 vs bound 63)."""
    con = _con(sf_dir)
    tok_max, = con.execute(
        f"SELECT max(strlen(t)) FROM (SELECT unnest({_TOK}) AS t "
        f"FROM documents)").fetchone()
    sh_max, = con.execute(f"""
        WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents)
        SELECT max(strlen(s)) FROM (
          SELECT unnest(list_transform(
                   range(1, greatest(len(toks) - {SHINGLE_K - 1}, 1) + 1),
                   i -> array_to_string(
                          list_slice(toks, i, i + {SHINGLE_K - 1}), ' '))) AS s
          FROM tok)""").fetchone()
    assert tok_max is not None and sh_max is not None
    assert tok_max <= MAX_STR, (
        f"token max {tok_max} B exceeds xxh64 unroll bound {MAX_STR} — "
        f"regen suite/xxh64_sql oracles with a larger max_len")
    assert sh_max <= MAX_STR, (
        f"shingle max {sh_max} B exceeds xxh64 unroll bound {MAX_STR} — "
        f"dedup_minhash's oracle would hash these to NULL at drive time")
    # the documented headroom: bound covers the measured maxima with
    # margin, so ordinary corpus drift doesn't land exactly on the edge
    assert sh_max + 8 <= MAX_STR, (
        f"shingle max {sh_max} B is within 8 B of the bound — raise "
        f"MAX_STR before the next corpus regen lands on the edge")


@sf_param
def test_bpe_oracle_token_encoding_assumptions(sf_dir):
    """No '|' and no control characters anywhere in documents.text —
    the _bpe_train_oracle / bpe_encode pipe-encoding contract."""
    con = _con(sf_dir)
    n_pipe, n_ctrl = con.execute(r"""
        SELECT count(*) FILTER (WHERE text LIKE '%|%'),
               count(*) FILTER (WHERE regexp_matches(text, '[\x00-\x1f\x7f]'))
        FROM documents""").fetchone()
    assert n_pipe == 0, (
        f"{n_pipe} documents contain '|' — the BPE oracles' "
        f"pipe-delimited token encoding would drop these tokens")
    assert n_ctrl == 0, (
        f"{n_ctrl} documents contain control chars — RE2 '.' skips "
        f"them, diverging the oracle from train_bpe's per-char split")
