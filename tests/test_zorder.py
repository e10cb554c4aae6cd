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
