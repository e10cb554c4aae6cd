"""Z-order clustering: the Morton key must interleave correctly and
produce multi-dimensional locality (both dimensions' spread shrinks per
chunk vs a single-column sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zoom_etl_spark.operators.zorder import zvalue


def _spread_per_chunk(rows, n_chunks=8):
    """Average (max-min) of each dimension within contiguous chunks."""
    size = max(1, len(rows) // n_chunks)
    sx = sy = 0
    chunks = [rows[i:i + size] for i in range(0, len(rows), size)]
    for ch in chunks:
        xs = [r[0] for r in ch]
        ys = [r[1] for r in ch]
        sx += max(xs) - min(xs)
        sy += max(ys) - min(ys)
    return sx / len(chunks), sy / len(chunks)


def test_zorder_improves_multidim_locality(spark):
    import random
    rnd = random.Random(7)
    data = [(rnd.randrange(10000), rnd.randrange(10000)) for _ in range(2000)]
    df = spark.createDataFrame(data, "x int, y int").coalesce(1)

    z = df.withColumn("z", zvalue([F.col("x"), F.col("y")], bits=8))
    by_z = [(r.x, r.y) for r in z.orderBy("z").collect()]
    by_x = [(r.x, r.y) for r in df.orderBy("x").collect()]

    zx, zy = _spread_per_chunk(by_z)
    xx, xy = _spread_per_chunk(by_x)
    # single-column sort: x tight, y unconstrained (~full range)
    assert xx < 2000 and xy > 8000
    # z-order: BOTH dimensions land well under the full range
    assert zx < 6000 and zy < 6000
    assert zy < xy * 0.6        # big win on the second dimension


def test_zvalue_interleave_known_case(spark):
    """bits=1: bucket = (v >= median); z = x_bit<<1 | y_bit."""
    df = spark.createDataFrame([(0, 0), (0, 100), (100, 0), (100, 100)], "x int, y int")
    got = {(r.x, r.y): r.z for r in
           df.withColumn("z", zvalue([F.col("x"), F.col("y")], bits=1)).collect()}
    assert got == {(0, 0): 0, (0, 100): 1, (100, 0): 2, (100, 100): 3}


def test_zorder_write_skips_real_parquet_files(spark, tmp_path):
    """End-to-end layout proof on real parquet footers: a y-only range
    predicate over an x-PARTITIONED table can skip nothing (every file
    spans y's full range), while the Z-ORDERED layout of the same rows
    keeps per-file y-intervals tight enough to skip most files. This is
    the mechanism the registered layout_zorder_cells query's cell
    extents quantify, driven through operators/zonemap.
    collect_file_stats — the same stats a table-format commit log would
    record at write time.

    Layout is DETERMINISTIC by construction (round-7 derandomization):
    files are written partitionBy an EXPLICIT bucket column — x-range
    sixteenths on one side, Z-value sixteenths (z // 4096 over the
    16-bit Morton domain) on the other — never repartitionByRange,
    whose SAMPLED boundaries shift with whatever session state earlier
    tests leave behind and once flipped this test's hard file-count
    bound in-suite. Fixed seed + explicit buckets ⇒ identical files
    under any test order."""
    import glob as _glob
    import random

    from zoom_etl_spark.operators.zonemap import (collect_file_stats,
                                                  prune_files)
    from zoom_etl_spark.operators.zorder import zvalue_minmax

    rnd = random.Random(11)
    data = [(rnd.randrange(100000), rnd.randrange(100000))
            for _ in range(40000)]
    df = spark.createDataFrame(data, "x int, y int")
    n_files = 16

    def write_bucketed(d, path):
        # one file per explicit "__p" bucket: hash-repartition ON the
        # bucket (deterministic Murmur3, no sampling) so each
        # partitionBy dir receives exactly one writer task's file
        (d.repartition(n_files, "__p")
          .write.mode("overwrite").partitionBy("__p").parquet(path))
        stats = {}
        for sub in sorted(_glob.glob(path + "/__p=*")):
            stats.update(collect_file_stats(sub, ["y"]))
        return stats

    px = str(tmp_path / "by_x")
    sx = write_bucketed(
        df.withColumn("__p", (F.col("x") / F.lit(100000 // n_files))
                      .cast("int")), px)
    pz = str(tmp_path / "by_z")
    z = zvalue_minmax([F.col("x"), F.col("y")],
                      [F.lit(0), F.lit(0)],
                      [F.lit(99999), F.lit(99999)], bits=8)
    sz = write_bucketed(
        df.withColumn("__p", (z / F.lit((1 << 16) // n_files))
                      .cast("int")), pz)
    assert len(sx) == n_files and len(sz) == n_files

    # a 15%-wide band on y ONLY, interior to one Z y-quartile
    # (each z-sixteenth fixes the top 2 bits of y's bucket, i.e. one
    # y-quartile; [30000, 45000] avoids the 25000/50000 boundaries)
    lo, hi = 30000, 45000
    keep_x = prune_files(sx, "y", "between", lo, hi)
    keep_z = prune_files(sz, "y", "between", lo, hi)
    # x-bucketed: every file spans ~the full y range — nothing skippable
    assert len(keep_x) == len(sx)
    # z-ordered: only the 4 files of the containing y-quartile survive
    assert len(keep_z) <= len(sz) // 2, (len(keep_z), len(sz))
    # pruning is a performance decision, never a correctness one
    n_full = spark.read.parquet(pz).filter(
        (F.col("y") >= lo) & (F.col("y") <= hi)).count()
    kept_df = spark.read.parquet(*keep_z).filter(
        (F.col("y") >= lo) & (F.col("y") <= hi)).count()
    assert kept_df == n_full


def test_zvalue_minmax_known_case(spark):
    """bits=2 over domain [0,3]: bucket is the value itself, so the
    Morton code is the textbook interleave — x bit i at output 2i+1,
    y bit i at 2i."""
    from zoom_etl_spark.operators.zorder import zvalue_minmax
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x int, y int")
    z = zvalue_minmax([F.col("x"), F.col("y")],
                      [F.lit(0), F.lit(0)], [F.lit(3), F.lit(3)], bits=2)
    got = {(r.x, r.y): r.z for r in df.withColumn("z", z).collect()}
    def morton(x, y):
        out = 0
        for i in range(2):
            out |= ((x >> i) & 1) << (2 * i + 1)
            out |= ((y >> i) & 1) << (2 * i)
        return out
    assert got == {(x, y): morton(x, y) for x, y in rows}
    # bucket normalization: a [0,99] domain lands every value in-range
    big = spark.createDataFrame([(0, 99), (99, 0), (50, 50)], "x int, y int")
    z8 = zvalue_minmax([F.col("x"), F.col("y")],
                       [F.lit(0), F.lit(0)], [F.lit(99), F.lit(99)], bits=8)
    vals = [r.z for r in big.withColumn("z", z8).collect()]
    assert all(0 <= v < (1 << 16) for v in vals)


def test_zvalue_minmax_bucket_division_is_exact(spark):
    """The operator's floor-of-double bucket division must equal exact
    integer floor division across a randomized domain sweep including
    boundary-bait numerators (exact multiples of the span and
    off-by-one around them) — the documented < 2^53 exactness
    argument, asserted rather than trusted."""
    import random

    from zoom_etl_spark.operators.zorder import zvalue_minmax

    rnd = random.Random(5)
    rows = []
    for _ in range(300):
        lo = rnd.randrange(0, 1 << 30)
        span = rnd.randrange(1, 1 << 31)
        hi = lo + span - 1
        xs = {lo, hi, lo + span // 2}
        for k in range(0, 256, 51):  # exact bucket-boundary multiples
            edge = lo + (k * span) // 256
            xs |= {max(lo, edge - 1), edge, min(hi, edge + 1)}
        rows += [(x, lo, hi) for x in xs]
    df = spark.createDataFrame(rows, "x long, lo long, hi long")
    z = zvalue_minmax([F.col("x"), F.col("x")],
                      [F.col("lo"), F.col("lo")],
                      [F.col("hi"), F.col("hi")], bits=8)
    got = [(r.x, r.lo, r.hi, r.z) for r in df.withColumn("z", z).collect()]
    for x, lo, hi, zv in got:
        b = ((x - lo) * 256) // (hi - lo + 1)   # exact Python ints
        want = 0
        for i in range(8):
            bit = (b >> i) & 1
            want |= bit << (2 * i + 1) | bit << (2 * i)
        assert zv == want, (x, lo, hi, zv, want)
