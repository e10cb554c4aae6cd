"""Join operators Spark lacks as primitives: as-of join and salted
(skew-resistant) join.

As-of join — "for each left row, the latest right row at-or-before its
timestamp" — is the union + forward-fill formulation: tag both sides,
sort each key's merged timeline once, carry the latest right payload
forward with last(ignorenulls). One shuffle, no pair materialization
(see ``asof_join`` for why the range-join alternative degenerates).

Salted join — when one join key is pathologically hot, a plain hash join
sends the whole hot key to one reducer. Salting splits each left key
into S shards and replicates the right side S× (right side only for the
salt space, not the data volume of the left), restoring parallelism at
the cost of an S× right-side fan-out. Use for fact-fact joins with known
hot keys; AQE's skew-join handles the moderate cases automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              right_cols: Sequence[str] | None = None,
              tiebreak: Sequence[Column] | None = None,
              how: str = "inner",
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_ts`` <= ``left_ts`` (per equi-key). Deterministic under ties
    via ``tiebreak`` (ordering over the right side aliased ``r``; without
    it, equal-timestamp right rows pick arbitrarily). ``how='left'``
    keeps unmatched left rows with NULL right columns.

    ``direction``: ``backward`` (default — greatest right_ts ≤ left_ts),
    ``forward`` (smallest right_ts ≥ left_ts), or ``nearest`` (closer of
    the two; exact ties prefer the backward/earlier match — the pandas
    merge_asof contract). All three ride the same single-shuffle
    timeline plan; nearest evaluates both fills over the one sorted
    window and picks per row.

    Union + forward-fill formulation: tag both sides, sort each key's
    timeline once, and carry the latest right payload forward with
    ``last(ignorenulls)``. ONE shuffle (the key partition) and per-row
    O(1) state — no intermediate pair blowup. The range-join + top-1
    alternative materializes every (left row × earlier right row) pair
    per key before pruning: a key with R right rows and L left rows costs
    O(L·R) — at 100 TB a hot user with 10k quotes × 1k trades is 10M
    rows for ONE key. The timeline sort costs O((L+R) log(L+R)) total
    and is skew-safe for the same reason windowed dedup is.
    """
    from pyspark.sql import Window

    right_cols = list(right_cols or (c for c in right.columns if c not in on))
    on = list(on)

    # one winner per (key, right_ts) so a tie can't poison the fill
    r = right.alias("r")
    if tiebreak is not None:
        w_tie = (Window.partitionBy(*[F.col(f"r.{k}") for k in on],
                                    F.col(f"r.{right_ts}"))
                 .orderBy(*tiebreak))
        r1 = (r.withColumn("__rn", F.row_number().over(w_tie))
              .filter(F.col("__rn") == 1).drop("__rn"))
    else:
        r1 = r.dropDuplicates([*on, right_ts])

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    # right rows sort before left at equal ts for backward/nearest
    # (inclusive "<=", and a distance-0 nearest match), after left for
    # forward (inclusive ">=" via the following frame)
    r_side, l_side = (1, 0) if direction == "forward" else (0, 1)
    payload = F.struct(F.col(right_ts).alias("__rt"),
                       *[F.col(c) for c in right_cols])
    rig = r1.select(*on,
                    F.col(right_ts).alias("__t"),
                    F.lit(r_side).alias("__side"),
                    payload.alias("__payload"))
    payload_t = rig.schema["__payload"].dataType
    extra = [c for c in left.columns if c not in on]
    lef = left.select(*on,
                      F.col(left_ts).alias("__t"),
                      F.lit(l_side).alias("__side"),
                      F.lit(None).cast(payload_t).alias("__payload"),
                      *extra)
    rig = rig.select(*rig.columns,
                     *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                       for c in extra])

    base = Window.partitionBy(*on).orderBy(F.col("__t"), F.col("__side"))
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    timeline = lef.unionByName(rig)
    if direction == "backward":
        timeline = timeline.withColumn(
            "__fill", F.last("__payload", ignorenulls=True).over(wb))
    elif direction == "forward":
        timeline = timeline.withColumn(
            "__fill", F.first("__payload", ignorenulls=True).over(wf))
    else:  # nearest: both fills over the SAME sorted window, pick per row
        bf = F.last("__payload", ignorenulls=True).over(wb)
        ff = F.first("__payload", ignorenulls=True).over(wf)
        timeline = (timeline.withColumn("__b", bf).withColumn("__f", ff)
                    .withColumn(
                        "__fill",
                        F.when(F.col("__b").isNull(), F.col("__f"))
                         .when(F.col("__f").isNull(), F.col("__b"))
                         # double cast: micros-exact for timestamps
                         # (< 2^53) and valid for numeric axes too —
                         # a long cast would truncate ts to seconds
                         .when((F.col("__t").cast("double")
                                - F.col("__b.__rt").cast("double"))
                               <= (F.col("__f.__rt").cast("double")
                                   - F.col("__t").cast("double")),
                               F.col("__b"))
                         .otherwise(F.col("__f"))))
    filled = timeline.filter(F.col("__side") == l_side)
    if how != "left":
        filled = filled.filter(F.col("__fill").isNotNull())
    return filled.select(*left.columns,
                         *[F.col(f"__fill.{c}").alias(f"asof_{c}")
                           for c in right_cols])


def skew_stats(df: DataFrame, key: str,
               sample_fraction: float = 0.01) -> dict:
    """Estimate join-key skew from a sampled, column-pruned scan.

    One Spark job: sample → groupBy(key) (map-side combined, shuffle
    bounded by distinct keys in the sample) → single-row agg. Returns
    ``{"n": sampled_rows, "top_count": hottest_key_count,
    "hot_share": top_count / n}``. At 100 TB the scan reads ONE column
    at ``sample_fraction`` of the data — cheap relative to the join it
    informs. The reference has no stats at all; its chunk splitter
    assumes uniform keys (SURVEY.md §4.1).
    """
    counts = (df.select(key).sample(fraction=sample_fraction, seed=7)
              .groupBy(key).count())
    row = counts.agg(F.sum("count").alias("n"),
                     F.max("count").alias("top")).first()
    n = int(row["n"] or 0)
    top = int(row["top"] or 0)
    return {"n": n, "top_count": top,
            "hot_share": (top / n) if n else 0.0}


def skew_stats_cms(df: DataFrame, key: str, sample_fraction: float = 0.01,
                   width: int = 8192, depth: int = 4,
                   support: float = 0.02, cache_path: str | None = None) -> dict:
    """``skew_stats`` with memory bounded by the SKETCH, not the key
    cardinality (ROADMAP item 3): the exact variant's groupBy holds one
    counter per distinct sampled key — at 100 TB an ultra-high-cardinality
    key column makes even the sampled histogram a memory hazard. Here:

    * a count-min sketch (Cormode & Muthukrishnan '05): ``depth``
      pairwise-independent hash rows × ``width`` counters, built as a
      groupBy over (row, bucket) — the shuffle and the driver collect are
      ≤ depth×width rows REGARDLESS of key cardinality. Estimates
      overshoot only (min over rows), by ≤ e·n/width w.h.p.
    * hot-key CANDIDATES from ``freqItems`` (Karp/Misra-Gries style,
      bounded at ~1/support entries) — a CMS can estimate any key but
      enumerate none; the two structures are complementary and both
      single-pass, mergeable, fixed-size.

    Sketch construction/merge/persistence lives in ``operators.stats``;
    ``cache_path`` (optional) reuses a previously-persisted table sketch
    instead of re-scanning — sketches are linear, so incremental ingest
    merges per-partition sketches into the cache (see ``stats.CMSketch``).

    Returns the ``skew_stats`` dict + ``{"mode": "cms"}``. top_count is
    the largest CMS estimate among candidates — an overestimate, which
    errs toward salting (the safe side for a skew guard).
    """
    from .stats import build_cms, cached_cms
    if cache_path is not None:
        sk = cached_cms(df, key, cache_path, sample_fraction, width, depth,
                        support)
    else:
        sk = build_cms(df, key, sample_fraction, width, depth, support)
    top = sk.top_estimate()
    return {"n": sk.n, "top_count": int(top),
            "hot_share": (top / sk.n) if sk.n else 0.0, "mode": "cms"}


def auto_join(left: DataFrame, right: DataFrame, key: str,
              how: str = "inner", skew_threshold: float = 0.2,
              n_salts: int = 8, sample_fraction: float = 0.01,
              decision_out: dict | None = None,
              stats_mode: str = "exact",
              stats_cache_path: str | None = None) -> DataFrame:
    """Equi-join that picks its physical strategy from data, not hope:
    sample the left side's key distribution and use ``salted_join`` when
    one key owns ≥ ``skew_threshold`` of the rows, else a plain join.

    AQE's skew-join splitter handles moderate skew at runtime; the salted
    path is for pathological keys (a single key spanning many partitions'
    worth of rows) where post-shuffle splitting still leaves one reducer
    reading the whole hot key's shuffle blocks. ``decision_out`` (if
    passed) is populated with the measured stats and the chosen strategy
    so pipelines can log WHY a plan was picked. ``stats_mode="cms"``
    swaps the exact sampled histogram for the count-min sketch
    (``skew_stats_cms``) — choose it when the key cardinality is high
    enough that even the sampled histogram is a memory concern; with
    ``stats_cache_path`` the sketch is read from (or persisted to) the
    table's stats cache, so repeated plans don't re-scan the table.
    """
    if stats_mode == "cms":
        stats = skew_stats_cms(left, key, sample_fraction=sample_fraction,
                               cache_path=stats_cache_path)
    else:
        stats = skew_stats(left, key, sample_fraction=sample_fraction)
    salted = stats["hot_share"] >= skew_threshold and how in ("inner", "left")
    if decision_out is not None:
        decision_out.update(stats, strategy="salted" if salted else "plain")
    if salted:
        return salted_join(left, right, key, n_salts=n_salts, how=how)
    return left.join(right, key, how)


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the left side salted into ``n_salts`` shards and the
    right side exploded across all shards — result identical to a plain
    join (verified in tests), parallelism restored for hot keys.

    Only inner/left joins are valid: the right side is physically
    replicated across the salt space, so right/full-outer would emit
    unmatched right rows once PER SALT (n_salts duplicates).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated right side would duplicate unmatched right rows")
    salted_left = left.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                          F.lit(n_salts))).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    salted_right = right.withColumn("__salt", salts)
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")


def band_join(left: DataFrame, right: DataFrame,
              left_val: str, right_val: str, band: int,
              bin_size: int | None = None) -> DataFrame:
    """Band join WITHOUT an equi anchor: all (left, right) pairs with
    ``|left_val - right_val| <= band`` (values in any integer unit —
    epoch days, micros, cents).

    A plain band predicate gives Spark nothing to hash on — the planner
    falls back to BroadcastNestedLoopJoin: O(|L|·|R|) comparisons, fatal
    at scale. Binning manufactures the equi key: bucket both sides into
    ``bin_size``-wide bins (default = band, the optimal width: candidate
    bins per row is then exactly 2), explode the left side into each bin
    a match could live in, equi-join on the bin id, and keep the band
    predicate as a residual filter. Cost: |L| × (band/bin_size + 1)
    candidate rows through ONE hash join — linear, shuffle-partitioned,
    AQE-skew-splittable like any equi join. The classic time-series /
    genomics interval-join technique (also how range joins are binned in
    warehouse engines).

    Each right row lands in exactly ONE bin and a left row's candidate
    bins are distinct, so every qualifying pair meets exactly once — no
    dedup pass needed regardless of bin_size.

    Columns: returns left.* + right.* (caller projects/aliases to avoid
    collisions before the call)."""
    bin_size = bin_size or band

    def _bin(c):  # floor division as a Column op (values may be negative)
        return F.floor(c / F.lit(bin_size)).cast("long")

    l = left.withColumn(
        "__bin", F.explode(F.sequence(_bin(F.col(left_val) - band),
                                      _bin(F.col(left_val) + band))))
    r = right.withColumn("__bin", _bin(F.col(right_val)))
    return (l.join(r, "__bin")
            .filter(F.abs(F.col(left_val) - F.col(right_val)) <= band)
            .drop("__bin"))
