"""DuckDB oracle builders for the xxhash64 PRODUCTION dedup variants
(round-8: `dedup_minhash` and `dedup_simhash` off the rows-only
ledger). The portable md5 twins (`dedup_minhash_exact`,
`dedup_simhash_exact`) have had oracles since round 4; the production
variants hash with Spark's ``xxhash64``, which DuckDB lacks — these
builders restate the ENTIRE pipelines (tokenize → hash → MinHash
signature → banded LSH → bucket cap → exact-Jaccard verify, and
tokenize → hash → 64-bit majority vote → bit pack) over the generated
XXH64-in-SQL of :mod:`.xxh64_sql`, so the driver value-hash-gates the
same rows Spark emits.

Exactness notes:
  * Signature slots are Spark's SIGNED-long ``array_min`` — the SQL
    min runs over ``to_signed`` values before the band chain converts
    back to unsigned for hashing.
  * The ``max_len`` unroll bound (module contract of xxh64_sql) is 63
    bytes — one stripe of headroom over the corpus maxima (longest
    normalized token 8 bytes, longest trigram shingle 26, identical at
    all three SFs); a longer future string hashes to NULL and the
    drive fails LOUDLY rather than silently mis-hashing. The bound is
    re-asserted against the live corpus every pytest run
    (tests/test_oracle_corpus_contract.py), so a regen fails early.
  * The threshold filter compares the ROUNDED ratio
    (``round(i/union, 4) >= threshold``), mirroring Spark's
    ``F.round(inter / union, 4) >= threshold`` bit-for-bit — a pair
    with true jaccard in [0.29995, 0.3) is kept by BOTH engines.
  * Jaccard verification intersects the per-doc shingle-HASH sets
    (signed BIGINT equality), exactly like the Spark plan — so even a
    64-bit hash collision (probability ~n²/2⁶⁴) would affect both
    engines identically.
  * Empty-token documents are outside the oracle contract (every
    corpus doc is ≥44 printable-ASCII chars, pinned by the multimodal
    oracles); the Spark short-doc whole-doc-shingle rule IS mirrored
    (``greatest(len - 2, 1)`` slice).

Spark twins: dedup/minhash.py (tokens/shingles/signature/bands/cap/
verify), dedup/simhash.py (per-instance token hashes, 64 conditional
sign sums, bit pack with the zero-token -1 rule).
"""

from __future__ import annotations

from .xxh64_sql import (SEED, Steps, from_signed, h, hash_int_staged,
                        hash_long_staged, hash_string_staged, to_signed)

MAX_STR = 63  # unroll bound: corpus max shingle 26 / token 8, +headroom

_TOK = (r"list_filter(string_split(regexp_replace(trim(lower(text)),"
        r" '\s+', ' ', 'g'), ' '), x -> x <> '')")


def _hashed_strings_cte(source_select: str, col: str) -> str:
    """Wrap ``source_select`` (yielding column ``col``) with the staged
    XXH64; returns SQL yielding (``col``, hu HUGEINT, hs BIGINT)."""
    s = Steps("hx")
    hv = hash_string_staged(s, col, max_len=MAX_STR)
    inner = s.render_nested(source_select)
    return (f"SELECT {col}, {hv} AS hu, {to_signed(hv)} AS hs"
            f" FROM ({inner})")


def minhash_oracle(k: int = 3, num_perm: int = 32, bands: int = 8,
                   threshold: float = 0.3, max_bucket: int = 1000) -> str:
    """The full dedup_minhash pipeline as one DuckDB statement."""
    rows = num_perm // bands
    parts = []
    # doc -> distinct shingles (Spark shingles(): k shifted zips,
    # whole-doc shingle for short docs, array_distinct)
    parts.append(f"""tok AS (
  SELECT doc_id, {_TOK} AS toks FROM documents
),
doc_sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - {k - 1}, 1) + 1),
                  i -> array_to_string(list_slice(toks, i, i + {k - 1}), ' '))) AS s
    FROM tok)
),
dsh AS (SELECT DISTINCT s FROM doc_sh),
hsh AS ({_hashed_strings_cte("SELECT s FROM dsh", "s")})""")
    # 32 salts: hash_int(seed_index, 42)
    s2 = Steps("sl")
    su = s2.add("CAST(seed AS HUGEINT)")
    salt = hash_int_staged(s2, su, h(SEED))
    parts.append(f"""salts AS (
  SELECT seed, {salt} AS salt
  FROM ({s2.render_nested(
      f"SELECT CAST(range AS BIGINT) AS seed FROM range(0, {num_perm})")})
)""")
    # per (shingle, perm) salted hash; signature min runs over SIGNED
    s3 = Steps("ph")
    ph = hash_long_staged(s3, "hu", "salt")
    parts.append(f"""perm_hash AS (
  SELECT s, seed, {to_signed(ph)} AS ph
  FROM ({s3.render_nested(
      "SELECT hsh.s, hsh.hu, salts.seed, salts.salt FROM hsh CROSS JOIN salts")})
),
sig AS (
  SELECT d.doc_id, p.seed, min(p.ph) AS v
  FROM doc_sh d JOIN perm_hash p ON p.s = d.s
  GROUP BY 1, 2
),
sigp AS (
  SELECT doc_id, CAST(seed // {rows} AS BIGINT) AS band,
         {", ".join(f"max(CASE WHEN seed % {rows} = {r} THEN v END) AS v{r}"
                    for r in range(rows))}
  FROM sig GROUP BY 1, 2
)""")
    # band keys: one staged chain per band value is unnecessary — the
    # chain only depends on (band, v0..v3), so ONE chain over the
    # 8-rows-per-doc frame with the band index hashed as the int seed.
    s4 = Steps("bk")
    bu = s4.add("CAST(band AS HUGEINT)")
    acc = hash_int_staged(s4, bu, h(SEED))
    for r in range(rows):
        vu = s4.add(from_signed(f"v{r}"))
        acc = hash_long_staged(s4, vu, acc)
    parts.append(f"""banded AS (
  SELECT doc_id, band, {to_signed(acc)} AS key
  FROM ({s4.render_nested("SELECT doc_id, band, "
                          + ", ".join(f"v{r}" for r in range(rows))
                          + " FROM sigp")})
),
capped AS (
  SELECT doc_id, band, key FROM (
    SELECT doc_id, band, key,
           count(*) OVER (PARTITION BY band, key) AS bsz
    FROM banded)
  WHERE bsz <= {max_bucket}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM doc_sh GROUP BY 1),
dh AS (SELECT d.doc_id, h.hs FROM doc_sh d JOIN hsh h ON h.s = d.s),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN dh a ON a.doc_id = c.id_a
  JOIN dh b ON b.doc_id = c.id_b AND b.hs = a.hs
  GROUP BY 1, 2
)""")
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT c.id_a, c.id_b,
       round(CAST(coalesce(i.i, 0) AS DOUBLE)
             / (sa.n + sb.n - coalesce(i.i, 0)), 4) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE round(CAST(coalesce(i.i, 0) AS DOUBLE)
      / (sa.n + sb.n - coalesce(i.i, 0)), 4) >= {threshold}"""


def simhash_oracle() -> str:
    """The full dedup_simhash pipeline as one DuckDB statement:
    per-INSTANCE token hashes (multiplicity-weighted votes), 64
    conditional sign sums, pack sign bits (b=0 is the MSB, matching
    shiftleft(..., 63 - b)); zero-token docs read -1."""
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h.hu // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" AS b{b}" for b in range(64))
    pack = " + ".join(
        f"(CASE WHEN coalesce(v.b{b}, 0) >= 0"
        f" THEN CAST({1 << (63 - b)} AS HUGEINT)"
        f" ELSE CAST(0 AS HUGEINT) END)" for b in range(64))
    return f"""WITH tok AS (
  SELECT doc_id, {_TOK} AS toks FROM documents
),
inst AS (SELECT doc_id, unnest(toks) AS t FROM tok),
vocab AS (SELECT DISTINCT t FROM inst),
vh AS ({_hashed_strings_cte("SELECT t FROM vocab", "t")}),
votes AS (
  SELECT i.doc_id, {bit_sums}
  FROM inst i JOIN vh h ON h.t = i.t
  GROUP BY 1
)
SELECT d.doc_id, {to_signed(f"({pack})")} AS simhash
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN votes v ON v.doc_id = d.doc_id"""
