"""Geospatial operators — grid-cell bucketing and the cell-blocked
spatial neighbor join (the geohash/S2 pattern every warehouse uses for
"things near things" at scale).

The testdata has no coordinates, so each customer gets a DETERMINISTIC
synthetic position derived from its key in exact integer centidegrees
(two coprime multipliers modulo the degree range) — both engines derive
the identical positions, so the family is fully oracle-checkable with
zero float geometry: distances compare as squared integer
centidegrees (flat-grid metric; real deployments swap in haversine at
the verify step only, the blocking is unchanged; antimeridian wrap
ignored for the synthetic grid).

Scale posture: the neighbor join NEVER goes all-pairs — each point
probes its 3×3 neighboring 1° cells through one equi-join on the cell
key (candidates ∝ local density), and each qualifying pair is produced
exactly once (probe cells of a ⋈ home cell of b). The oracle is the
O(n²) brute-force definition at sf 0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# centidegree positions: y ∈ [-9000, 9000), x ∈ [-18000, 18000).
# x uses a QUADRATIC mix — two linear multipliers share a lattice
# structure (Δy, Δx fixed per Δkey), which left zero close pairs; the
# quadratic term decorrelates the axes (8 pairs at sf0.01, ~1.3k at
# sf0.1 under the 0.5° radius). The square is taken AFTER reducing the
# key modulo the range — k² ≡ (k mod m)² (mod m), so positions are
# identical wherever the raw square fits, and the expression no longer
# overflows int64 at large key ranges (the 10× smoke's key-stride
# replication overflowed the raw k²·31 at ~9e8 keys; real 100 TB key
# spaces would too)
_Y = "(c_custkey * 7919) % 18000 - 9000"
_X = ("((c_custkey % 36000) * (c_custkey % 36000) * 31"
      " + c_custkey * 104729) % 36000 - 18000")
_R2 = 2500  # neighbor radius: 50 centidegrees, squared


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(F.col("c_custkey").alias("id"),
                    F.expr(_Y).alias("y"), F.expr(_X).alias("x"),
                    F.col("c_acctbal"))


@query("geo_cell_rollup", oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id, {_Y} AS y, {_X} AS x, c_acctbal FROM customer
)
SELECT CAST(floor(y / 100.0) AS INT) AS cell_y,
       CAST(floor(x / 100.0) AS INT) AS cell_x,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(c_acctbal), 2) AS balance
FROM pts GROUP BY 1, 2
""")
def geo_cell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density/value rollup on a 1° grid — the tile aggregation behind
    every map heatmap. Cell ids are floor-divided integers (exact both
    engines); one map-combined aggregate keyed by the grid-bounded cell
    id, so the shuffle is tile-count-sized at any corpus scale."""
    p = _points(spark, sf_dir)
    return (p.groupBy(
                F.floor(F.col("y") / 100.0).cast("int").alias("cell_y"),
                F.floor(F.col("x") / 100.0).cast("int").alias("cell_x"))
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("c_acctbal"), 2).alias("balance")))


@query("geo_neighbor_pairs", oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id, {_Y} AS y, {_X} AS x FROM customer
)
SELECT a.id AS id_a, b.id AS id_b,
       (a.y - b.y) * (a.y - b.y) + (a.x - b.x) * (a.x - b.x) AS d2
FROM pts a JOIN pts b
  ON a.id < b.id
 AND (a.y - b.y) * (a.y - b.y) + (a.x - b.x) * (a.x - b.x) <= {_R2}
""")
def geo_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial neighbor join: customer pairs within 0.5° (integer
    squared-centidegree metric, exact in both engines). The scale plan
    is cell blocking, never all-pairs: side A explodes to its 3×3 probe
    cells, side B keeps its home cell, ONE equi-join on the cell key
    produces each candidate exactly once (probe × home), and the
    distance predicate verifies as a residual filter. Candidates are
    bounded by local density × 9; the oracle is the O(n²) definition."""
    p = _points(spark, sf_dir)
    cell_y = F.floor(F.col("y") / 100.0).cast("long")
    cell_x = F.floor(F.col("x") / 100.0).cast("long")
    home = p.select("id", "y", "x",
                    (cell_y * 100000 + cell_x).alias("cell"))
    offs = F.expr("explode(flatten(transform(sequence(-1, 1), dy -> "
                  "transform(sequence(-1, 1), dx -> struct(dy, dx)))))")
    probe = (p.select("id", "y", "x", cell_y.alias("cy"),
                      cell_x.alias("cx"))
              .select("id", "y", "x", offs.alias("o"))
              .select(F.col("id").alias("id_a"), F.col("y").alias("ya"),
                      F.col("x").alias("xa"),
                      ((F.floor(F.col("y") / 100.0).cast("long")
                        + F.col("o.dy")) * 100000
                       + F.floor(F.col("x") / 100.0).cast("long")
                       + F.col("o.dx")).alias("cell")))
    d2 = ((F.col("ya") - F.col("y")) * (F.col("ya") - F.col("y"))
          + (F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x")))
    return (probe.join(home, "cell")
                 .filter(F.col("id_a") < F.col("id"))
                 .filter(d2 <= _R2)
                 .select(F.col("id_a"), F.col("id").alias("id_b"),
                         d2.alias("d2")))


# ---------------------------------------------------------------------------
# Polygon containment — exact integer half-plane tests on convex fences.
#
# Three hand-checked convex CCW polygons in centidegree (x, y) space
# (a diamond, a rectangle, an irregular pentagon). Convexity makes
# point-in-polygon a pure integer conjunction: P is inside iff for every
# directed edge (x0,y0)->(x1,y1), cross = (x1-x0)*(Py-y0)-(y1-y0)*(Px-x0)
# >= 0 (boundary inclusive). No floats anywhere, so Spark and DuckDB
# agree bit-for-bit.
_POLY_EDGES = [
    # poly 1: diamond centered (0,0), r=2000
    (1, 2000, 0, 0, 2000), (1, 0, 2000, -2000, 0),
    (1, -2000, 0, 0, -2000), (1, 0, -2000, 2000, 0),
    # poly 2: rectangle x in [5000,9000], y in [-4000,-1000]
    (2, 5000, -4000, 9000, -4000), (2, 9000, -4000, 9000, -1000),
    (2, 9000, -1000, 5000, -1000), (2, 5000, -1000, 5000, -4000),
    # poly 3: convex pentagon near (-10000, 4000)
    (3, -12000, 3000, -9000, 2500), (3, -9000, 2500, -8000, 4500),
    (3, -8000, 4500, -10000, 6000), (3, -10000, 6000, -12500, 5000),
    (3, -12500, 5000, -12000, 3000),
]
_EDGES_SQL = ", ".join(f"({p}, {x0}, {y0}, {x1}, {y1})"
                       for p, x0, y0, x1, y1 in _POLY_EDGES)

# Per-polygon bounding boxes, folded driver-side: the fences are module
# literals, so their bboxes are too — no reason to run a Spark aggregate
# (plus an exchange) to compute 3 constant rows per query invocation.
_POLY_BBOX = {}
for _p, _x0, _y0, _x1, _y1 in _POLY_EDGES:
    bx0, bx1, by0, by1 = _POLY_BBOX.get(_p, (10**9, -10**9, 10**9, -10**9))
    _POLY_BBOX[_p] = (min(bx0, _x0, _x1), max(bx1, _x0, _x1),
                      min(by0, _y0, _y1), max(by1, _y0, _y1))
_BBOX_SQL = ", ".join(f"({p}, {v[0]}, {v[1]}, {v[2]}, {v[3]})"
                      for p, v in sorted(_POLY_BBOX.items()))


def _values_df(spark: SparkSession, values_sql: str, cols: str):
    """Inline VALUES literal as a JVM LocalRelation. createDataFrame
    would route the rows through applySchemaToPythonRDD — a Python RDD
    scan that spins Python workers on every invocation (measured as the
    flaky 2×-over-max tail on geo_polygon_contain); a VALUES scan is
    constant-folded JVM-side with zero Python in the executed plan."""
    return spark.sql(f"SELECT * FROM (VALUES {values_sql}) AS t({cols})")


@query("geo_polygon_contain", oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id, {_Y} AS y, {_X} AS x,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
edges(poly_id, x0, y0, x1, y1) AS (VALUES {_EDGES_SQL}),
bbox AS (
  SELECT poly_id, min(least(x0, x1)) AS bx0, max(greatest(x0, x1)) AS bx1,
         min(least(y0, y1)) AS by0, max(greatest(y0, y1)) AS by1
  FROM edges GROUP BY 1
),
cand AS (
  SELECT p.id, p.x, p.y, p.cents, b.poly_id
  FROM pts p JOIN bbox b
    ON p.x BETWEEN b.bx0 AND b.bx1 AND p.y BETWEEN b.by0 AND b.by1
),
inside AS (
  SELECT c.id, c.poly_id, c.cents
  FROM cand c JOIN edges e ON c.poly_id = e.poly_id
  GROUP BY c.id, c.poly_id, c.cents
  HAVING min((e.x1 - e.x0) * (c.y - e.y0)
             - (e.y1 - e.y0) * (c.x - e.x0)) >= 0
)
SELECT poly_id, CAST(count(*) AS BIGINT) AS n_inside,
       CAST(sum(cents) AS BIGINT) AS balance_cents
FROM inside GROUP BY poly_id
""")
def geo_polygon_contain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon rollup over convex geofences — the "customers
    inside this delivery zone" query. Fences are broadcast twice (bbox
    prefilter, then the edge table), so the only work proportional to
    the corpus is one scan: each point first hits the bounding-box
    prefilter (range predicate on a broadcast join — candidates are
    density x fence area, never corpus x fences edges), and only
    candidates pay the per-edge integer half-plane conjunction. All
    arithmetic is integer cross products and summed integer cents, so
    the DuckDB oracle matches exactly. At 100 TB the fence table stays
    driver-bounded (thousands of polygons is still KB) and the plan is
    scan -> broadcast-filter -> broadcast-join -> partial agg."""
    p = _points(spark, sf_dir).select(
        "id", "y", "x",
        F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").alias("cents"))
    edges = _values_df(spark, _EDGES_SQL, "poly_id, x0, y0, x1, y1")
    bbox = _values_df(spark, _BBOX_SQL, "poly_id, bx0, bx1, by0, by1")
    cand = p.join(
        F.broadcast(bbox),
        (F.col("x").between(F.col("bx0"), F.col("bx1"))
         & F.col("y").between(F.col("by0"), F.col("by1"))))
    cross = ((F.col("x1") - F.col("x0")) * (F.col("y") - F.col("y0"))
             - (F.col("y1") - F.col("y0")) * (F.col("x") - F.col("x0")))
    inside = (cand.join(F.broadcast(edges), "poly_id")
                  .groupBy("id", "poly_id", "cents")
                  .agg(F.min(cross).alias("min_cross"))
                  .filter(F.col("min_cross") >= 0))
    return (inside.groupBy("poly_id")
                  .agg(F.count("*").alias("n_inside"),
                       F.sum("cents").alias("balance_cents")))


@query("geo_multires_rollup", oracle=f"""
WITH pts AS (
  SELECT {_Y} AS y, {_X} AS x,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
fine AS (
  SELECT CAST(floor(y / 100.0) AS BIGINT) AS cy,
         CAST(floor(x / 100.0) AS BIGINT) AS cx,
         count(*) AS n, sum(cents) AS cents
  FROM pts GROUP BY 1, 2
)
SELECT res, cell_y, cell_x, CAST(sum(n) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS balance_cents
FROM (
  SELECT 1 AS res, cy AS cell_y, cx AS cell_x, n, cents FROM fine
  UNION ALL
  SELECT 4, CAST(floor(cy / 4.0) AS BIGINT),
            CAST(floor(cx / 4.0) AS BIGINT), n, cents FROM fine
  UNION ALL
  SELECT 16, CAST(floor(cy / 16.0) AS BIGINT),
             CAST(floor(cx / 16.0) AS BIGINT), n, cents FROM fine
) pyr GROUP BY res, cell_y, cell_x
""")
def geo_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution tile pyramid (1-degree, 4-degree, 16-degree) with
    partial reuse — the quadtree/H3-parent pattern: aggregate the corpus
    ONCE at the finest resolution, then derive every coarser level from
    the fine partials (floor-divide the cell id, re-sum counts/cents).
    The corpus-sized shuffle happens exactly once; the pyramid levels
    shuffle tile-count-sized rows. Counts and integer cents are exact,
    so every level hash-matches the oracle."""
    p = _points(spark, sf_dir).select(
        "y", "x",
        F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").alias("cents"))
    fine = (p.groupBy(
                F.floor(F.col("y") / 100.0).cast("long").alias("cy"),
                F.floor(F.col("x") / 100.0).cast("long").alias("cx"))
             .agg(F.count("*").alias("n"), F.sum("cents").alias("cents")))
    levels = []
    for res in (1, 4, 16):
        levels.append(fine.select(
            F.lit(res).cast("int").alias("res"),
            F.floor(F.col("cy") / float(res)).cast("long").alias("cell_y"),
            F.floor(F.col("cx") / float(res)).cast("long").alias("cell_x"),
            "n", "cents"))
    pyramid = levels[0].unionByName(levels[1]).unionByName(levels[2])
    return (pyramid.groupBy("res", "cell_y", "cell_x")
                   .agg(F.sum("n").alias("n"),
                        F.sum("cents").alias("balance_cents")))


# ---------------------------------------------------------------------------
# Non-convex containment — exact integer ray casting (even-odd rule).
#
# The convex conjunction above cannot express concave fences or holes;
# the crossing-number test can. For point P and directed edge
# (x0,y0)->(x1,y1): an UPWARD edge (y0 <= Py < y1) crosses the rightward
# ray iff P is strictly left of the edge (cross > 0); a DOWNWARD edge
# (y1 <= Py < y0) iff strictly right (cross < 0). The half-open y rule
# counts vertex hits exactly once; everything is integer cross products,
# so both engines agree bit-for-bit. Even-odd also gives holes for free:
# the donut's inner ring simply adds two more crossings.
_RAY_POLYS = {
    # poly 10: U-shape (concave), x in [12000,16000], y in [-8000,-4000]
    10: [(12000, -8000), (16000, -8000), (16000, -4000), (15000, -4000),
         (15000, -7000), (13000, -7000), (13000, -4000), (12000, -4000)],
    # poly 11: donut — outer ring then inner hole ring (even-odd)
    11: [(-6000, 2000), (-2000, 2000), (-2000, 6000), (-6000, 6000)],
    12: [(-5000, 3000), (-5000, 5000), (-3000, 5000), (-3000, 3000)],
    # poly 13: 4-point star (concave octagon) centered (6000, 5000)
    13: [(6000, 7000), (6500, 5500), (8000, 5000), (6500, 4500),
         (6000, 3000), (5500, 4500), (4000, 5000), (5500, 5500)],
}
# ring -> fence: the donut's hole ring (11/12) rolls up under fence 11
_RAY_FENCE = {10: 10, 11: 11, 12: 11, 13: 13}
_RAY_EDGES = [
    (_RAY_FENCE[pid], x0, y0, x1, y1)
    for pid, vs in _RAY_POLYS.items()
    for (x0, y0), (x1, y1) in zip(vs, vs[1:] + vs[:1])
]
_RAY_EDGES_SQL = ", ".join(f"({p}, {x0}, {y0}, {x1}, {y1})"
                           for p, x0, y0, x1, y1 in _RAY_EDGES)


def _ray_bbox_sql() -> str:
    """Driver-side-folded bboxes of the literal ray-cast fences (same
    rationale as _BBOX_SQL: 3 constant rows deserve no Spark agg)."""
    bb = {}
    for p, x0, y0, x1, y1 in _RAY_EDGES:
        bx0, bx1, by0, by1 = bb.get(p, (10**9, -10**9, 10**9, -10**9))
        bb[p] = (min(bx0, x0, x1), max(bx1, x0, x1),
                 min(by0, y0, y1), max(by1, y0, y1))
    return ", ".join(f"({p}, {v[0]}, {v[1]}, {v[2]}, {v[3]})"
                     for p, v in sorted(bb.items()))
_CROSSING_SQL = """CASE
  WHEN e.y0 <= c.y AND c.y < e.y1
   AND (e.x1 - e.x0) * (c.y - e.y0) - (e.y1 - e.y0) * (c.x - e.x0) > 0
  THEN 1
  WHEN e.y1 <= c.y AND c.y < e.y0
   AND (e.x1 - e.x0) * (c.y - e.y0) - (e.y1 - e.y0) * (c.x - e.x0) < 0
  THEN 1 ELSE 0 END"""


@query("geo_polygon_raycast", oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id, {_Y} AS y, {_X} AS x,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
edges(poly_id, x0, y0, x1, y1) AS (VALUES {_RAY_EDGES_SQL}),
bbox AS (
  SELECT poly_id, min(least(x0, x1)) AS bx0, max(greatest(x0, x1)) AS bx1,
         min(least(y0, y1)) AS by0, max(greatest(y0, y1)) AS by1
  FROM edges GROUP BY 1
),
cand AS (
  SELECT p.id, p.x, p.y, p.cents, b.poly_id
  FROM pts p JOIN bbox b
    ON p.x BETWEEN b.bx0 AND b.bx1 AND p.y BETWEEN b.by0 AND b.by1
),
inside AS (
  SELECT c.id, c.poly_id, c.cents
  FROM cand c JOIN edges e ON c.poly_id = e.poly_id
  GROUP BY c.id, c.poly_id, c.cents
  HAVING sum({_CROSSING_SQL}) % 2 = 1
)
SELECT poly_id, CAST(count(*) AS BIGINT) AS n_inside,
       CAST(sum(cents) AS BIGINT) AS balance_cents
FROM inside GROUP BY poly_id
""")
def geo_polygon_raycast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NON-convex point-in-polygon rollup by exact integer ray casting
    (even-odd crossing rule) — concave fences and fences with holes,
    which the convex half-plane conjunction (`geo_polygon_contain`)
    cannot express: a U-shaped zone, a donut whose inner ring is an
    exclusion hole (even-odd counts its crossings automatically), and a
    concave 4-point star. Upward edges count when the point is strictly
    left (integer cross product > 0), downward when strictly right; the
    half-open y interval makes vertex hits count exactly once. Same
    scale posture as the convex query: fences broadcast twice (bbox
    prefilter, then edges), one corpus scan, per-candidate work =
    n_edges integer ops, partial agg — nothing else grows with the
    corpus."""
    p = _points(spark, sf_dir).select(
        "id", "y", "x",
        F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").alias("cents"))
    edges = _values_df(spark, _RAY_EDGES_SQL, "poly_id, x0, y0, x1, y1")
    bbox = _values_df(spark, _ray_bbox_sql(), "poly_id, bx0, bx1, by0, by1")
    cand = p.join(
        F.broadcast(bbox),
        (F.col("x").between(F.col("bx0"), F.col("bx1"))
         & F.col("y").between(F.col("by0"), F.col("by1"))))
    cross = ((F.col("x1") - F.col("x0")) * (F.col("y") - F.col("y0"))
             - (F.col("y1") - F.col("y0")) * (F.col("x") - F.col("x0")))
    up = (F.col("y0") <= F.col("y")) & (F.col("y") < F.col("y1"))
    down = (F.col("y1") <= F.col("y")) & (F.col("y") < F.col("y0"))
    crossing = (F.when(up & (cross > 0), 1)
                 .when(down & (cross < 0), 1).otherwise(0))
    inside = (cand.join(F.broadcast(edges), "poly_id")
                  .groupBy("id", "poly_id", "cents")
                  .agg(F.sum(crossing).alias("n_cross"))
                  .filter(F.col("n_cross") % 2 == 1))
    return (inside.groupBy("poly_id")
                  .agg(F.count("*").alias("n_inside"),
                       F.sum("cents").alias("balance_cents")))


# ---------------------------------------------------------------------------
# Equal-area cells — latitude bands uniform in sin(lat) (Lambert
# cylindrical equal-area), longitude columns uniform in degrees: every
# (band, col) cell covers the same sphere area. The sine is Bhaskara I's
# rational approximation evaluated in EXACT INTEGER arithmetic
# (4a(18000-a)·1e6 // (405000000 - a(18000-a)) for |lat| centidegrees a;
# max error ~0.0016, monotonic on the quarter wave) — the approximation
# IS the cell definition, so Spark and DuckDB agree bit-for-bit where a
# libm sin would diverge in the last ulp and flip boundary points.
_EA_T = "(abs(y) * (18000 - abs(y)))"
_EA_SIN_DUCK = (f"(CASE WHEN y < 0 THEN -1 ELSE 1 END"
                f" * ((4 * {_EA_T} * 1000000) // (405000000 - {_EA_T})))")
_EA_SIN_SPARK = (f"(CASE WHEN y < 0 THEN -1 ELSE 1 END"
                 f" * ((4 * {_EA_T} * 1000000) div (405000000 - {_EA_T})))")
_EA_BANDS, _EA_COLS = 12, 24


@query("geo_equalarea_rollup", oracle=f"""
WITH pts AS (
  SELECT {_Y} AS y, {_X} AS x,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
cells AS (
  SELECT ({_EA_BANDS} * ({_EA_SIN_DUCK} + 1000000)) // 2000000 AS band,
         (x + 18000) // 1500 AS col, cents
  FROM pts
),
fine AS (
  SELECT band, col, count(*) AS n, sum(cents) AS cents
  FROM cells GROUP BY 1, 2
)
SELECT res, cell_band, cell_col, CAST(sum(n) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS balance_cents
FROM (
  SELECT 1 AS res, band AS cell_band, col AS cell_col, n, cents FROM fine
  UNION ALL
  SELECT 2, band // 2, col // 2, n, cents FROM fine
) pyr GROUP BY res, cell_band, cell_col
""")
def geo_equalarea_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUAL-AREA cell rollup (roadmap: beyond degree tiles): latitude
    bands uniform in sin(lat) — the Lambert cylindrical equal-area
    construction behind H3/S2-style balanced cells — so a polar cell
    holds the same sphere area as an equatorial one, where the 1-degree
    grid's polar tiles shrink toward zero and skew every density
    comparison. 12 bands x 24 columns at the fine level; the coarse
    level floor-divides band/col by 2 (adjacent equal-area cells merge
    pairwise, so coarse cells are equal-area too) and derives from the
    FINE partials, the `geo_multires_rollup` partial-reuse shape.
    sin(lat) is Bhaskara I's rational approximation in exact integer
    arithmetic (monotonic, ~1.6e-3 max error — it DEFINES the banding,
    making the cell ids engine-exact; a libm sine would flip boundary
    points between engines). Plan: one scan, row-local integer cell
    ids, one fine map-combined aggregate; the pyramid level shuffles
    cell-count-sized partials only."""
    p = _points(spark, sf_dir).select(
        "y", "x",
        F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").alias("cents"))
    band = F.expr(f"({_EA_BANDS} * ({_EA_SIN_SPARK} + 1000000)) div 2000000")
    col = F.expr("(x + 18000) div 1500")
    fine = (p.select(band.alias("band"), col.alias("col"), "cents")
             .groupBy("band", "col")
             .agg(F.count("*").alias("n"), F.sum("cents").alias("cents")))
    levels = [
        fine.select(F.lit(1).alias("res"), F.col("band").alias("cell_band"),
                    F.col("col").alias("cell_col"), "n", "cents"),
        fine.select(F.lit(2).alias("res"),
                    F.expr("band div 2").alias("cell_band"),
                    F.expr("col div 2").alias("cell_col"), "n", "cents"),
    ]
    return (levels[0].unionByName(levels[1])
            .groupBy("res", "cell_band", "cell_col")
            .agg(F.sum("n").alias("n"),
                 F.sum("cents").alias("balance_cents")))


@query("geo_neighbor_haversine", oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id, ({_Y}) / 100.0 AS lat, ({_X}) / 100.0 AS lon
  FROM customer
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         2 * 6371008.8 * asin(sqrt(least(
            pow(sin(radians(b.lat - a.lat) / 2), 2)
            + cos(radians(a.lat)) * cos(radians(b.lat))
              * pow(sin(radians(b.lon - a.lon) / 2), 2), 1.0))) AS d
  FROM pts a JOIN pts b ON a.id < b.id
  -- lat prefilter (250 km < 3 deg latitude) keeps the O(n^2) oracle
  -- tractable; semantically free, any in-radius pair satisfies it
  WHERE abs(a.lat - b.lat) <= 3
)
SELECT id_a, id_b, CAST(floor(d / 1000) AS INT) AS dist_km
FROM pairs WHERE d <= 250000.0
""")
def geo_neighbor_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle neighbor join (250 km): the metric-correct verify
    step the flat-grid ``geo_neighbor_pairs`` defers to production
    (ROADMAP item 6). Blocking is latitude-aware cell probing with
    antimeridian wrap and a polar-cap fallback
    (operators/spatial.py::neighbor_join_haversine); candidates stay
    density-bounded, never all-pairs.

    ORACLE-GATED (round-4 promotion from rows-only): both engines run
    the identical double-precision haversine, whose libm-vs-JVM trig
    divergence is bounded by a few ulp (~1e-7 m at this radius), and
    the hashed outputs are quantized to whole KILOMETERS (floor) with
    an empirically-asserted guard band — no pair's distance sits
    within 2 mm of a km boundary or within 0.39 m of the 250 km cutoff
    at any test SF (tests/test_spatial.py::test_haversine_oracle_guard
    _band re-checks on every run, so a testdata regen that lands on a
    boundary fails loudly here, not in the driver). Meter-precision
    distances remain property-gated in test_spatial.py against the
    brute-force oracle (pair-set exact, distances rtol)."""
    from ..operators.spatial import neighbor_join_haversine
    p = (_points(spark, sf_dir)
         .select("id", (F.col("y") / 100.0).alias("lat"),
                 (F.col("x") / 100.0).alias("lon")))
    pairs = neighbor_join_haversine(p, radius_m=250_000.0)
    return pairs.select("id_a", "id_b",
                        F.floor(F.col("dist_m") / 1000).cast("int")
                         .alias("dist_km"))


@query("geo_dbscan_grid", oracle=f"""
WITH RECURSIVE pts AS (
  SELECT c_custkey AS id, {{_Y}} AS y, {{_X}} AS x FROM customer
),
cells AS (
  SELECT CAST(floor(y / 500.0) AS INT) AS cy,
         CAST(floor(x / 1000.0) AS INT) AS cx,
         CAST(count(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2
),
nb AS (
  SELECT a.cy, a.cx, a.n, CAST(sum(b.n) AS BIGINT) AS s
  FROM cells a JOIN cells b
    ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
  GROUP BY 1, 2, 3
),
core AS (
  SELECT cy, cx, n, (cy + 18) * 100 + (cx + 18) AS nid
  FROM nb WHERE s >= 12
),
edges AS (
  SELECT a.nid AS u, b.nid AS v
  FROM core a JOIN core b
    ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
   AND a.nid <> b.nid
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
cc AS (
  SELECT u AS nid, least(u, min(v)) AS cluster FROM reach GROUP BY u
),
corec AS (
  SELECT core.cy, core.cx, core.n,
         coalesce(cc.cluster, core.nid) AS cluster
  FROM core LEFT JOIN cc ON core.nid = cc.nid
),
border AS (
  SELECT nb.cy, nb.cx, nb.n, min(corec.cluster) AS cluster
  FROM nb JOIN corec
    ON abs(nb.cy - corec.cy) <= 1 AND abs(nb.cx - corec.cx) <= 1
  WHERE nb.s < 12
  GROUP BY 1, 2, 3
)
SELECT cy, cx, n, 'core' AS role, CAST(cluster AS BIGINT) AS cluster
FROM corec
UNION ALL
SELECT cy, cx, n, 'border', CAST(cluster AS BIGINT) FROM border
UNION ALL
SELECT nb.cy, nb.cx, nb.n, 'noise', CAST(NULL AS BIGINT)
FROM nb
WHERE nb.s < 12
  AND NOT EXISTS (SELECT 1 FROM corec
                  WHERE abs(nb.cy - corec.cy) <= 1
                    AND abs(nb.cx - corec.cx) <= 1)
""".format(_Y=_Y, _X=_X))
def geo_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-based spatial clustering at CELL granularity — the
    grid-DBSCAN scale recipe (bin points, then run DBSCAN on cell
    counts): a cell is CORE when its 3x3 neighborhood holds >= 12
    points, clusters are connected components over 8-adjacent core
    cells (min-cell-id labels; isolated cores are their own cluster),
    non-core cells adjacent to a core join its MINIMUM cluster label
    as BORDER (deterministic tie-break), and the rest is NOISE — the
    density paradigm k-means/IVF can't express (arbitrary-shape
    clusters, explicit outliers). Exact integer geometry end to end:
    cells divide the integer centi-degree grid, adjacency is integer
    |delta| <= 1, labels are integer min-folds. Scale: the ONLY
    point-sized work is the first groupBy(cell); every later step
    (neighborhood join, CC iterations, border assignment) runs on the
    cell-domain-bounded frame — the reason grid-DBSCAN scales where
    point-pair DBSCAN cannot. Spark CC = the dedup label-propagation
    operator (diameter-bounded, loud on non-convergence); oracle = a
    recursive-CTE closure over the same edges."""
    from ..dedup.cluster import connected_components
    p = _points(spark, sf_dir)
    cells = (p.groupBy(
                F.floor(F.col("y") / 500.0).cast("int").alias("cy"),
                F.floor(F.col("x") / 1000.0).cast("int").alias("cx"))
              .agg(F.count("*").alias("n"))
              .localCheckpoint(eager=False))
    a = cells.select(F.col("cy").alias("acy"), F.col("cx").alias("acx"),
                     F.col("n").alias("an"))
    nb = (a.join(cells,
                 (F.abs(F.col("acy") - F.col("cy")) <= 1)
                 & (F.abs(F.col("acx") - F.col("cx")) <= 1))
           .groupBy(F.col("acy").alias("cy"), F.col("acx").alias("cx"),
                    F.col("an").alias("n"))
           .agg(F.sum("n").alias("s"))
           .localCheckpoint(eager=False))
    core = (nb.filter(F.col("s") >= 12)
              .withColumn("nid", (F.col("cy") + 18) * 100 + F.col("cx")
                          + 18))
    ca = core.select(F.col("cy").alias("acy"), F.col("cx").alias("acx"),
                     F.col("nid").alias("id_a"))
    edges = (ca.join(core,
                     (F.abs(F.col("acy") - F.col("cy")) <= 1)
                     & (F.abs(F.col("acx") - F.col("cx")) <= 1)
                     & (F.col("id_a") != F.col("nid")))
               .select("id_a", F.col("nid").alias("id_b")))
    # the cell graph's diameter is bounded by grid rows + cols
    # (36 + 36 here) regardless of corpus size — at 10x density the
    # core graph spans the whole grid. Pointer-jumping CC covers that
    # in O(log 72) ≈ 7 rounds (it was this query's 12 s of round
    # overhead under pure min-prop); 80 stays as a generous ceiling
    cc = connected_components(edges, max_iter=80)
    corec = (core.join(cc.withColumnRenamed("node", "nid"), "nid", "left")
                 .select("cy", "cx", "n",
                         F.coalesce("cluster", "nid").cast("long")
                          .alias("cluster"))
                 .localCheckpoint(eager=False))
    noncore = nb.filter(F.col("s") < 12)
    na = noncore.select(F.col("cy").alias("acy"), F.col("cx").alias("acx"),
                        F.col("n").alias("an"))
    adj = (na.join(corec,
                   (F.abs(F.col("acy") - F.col("cy")) <= 1)
                   & (F.abs(F.col("acx") - F.col("cx")) <= 1))
             .groupBy(F.col("acy").alias("cy"), F.col("acx").alias("cx"),
                      F.col("an").alias("n"))
             .agg(F.min("cluster").alias("cluster")))
    border = adj.select("cy", "cx", "n", F.lit("border").alias("role"),
                        "cluster")
    noise = (noncore.join(adj.select(F.col("cy").alias("bcy"),
                                     F.col("cx").alias("bcx")),
                          (F.col("cy") == F.col("bcy"))
                          & (F.col("cx") == F.col("bcx")), "left_anti")
                    .select("cy", "cx", "n", F.lit("noise").alias("role"),
                            F.lit(None).cast("long").alias("cluster")))
    corout = corec.select("cy", "cx", "n", F.lit("core").alias("role"),
                          "cluster")
    return corout.unionByName(border).unionByName(noise)


# trajectory synthesis: each user gets a deterministic HOME (key-mixed
# centidegrees over a ±20°/±40° region so users actually co-locate) and
# each event a bounded ±1° offset — coherent, localized trajectories in
# exact integers (the family's zero-float discipline). The quadratic
# x-mix reduces modulo the range BEFORE squaring (overflow-safe at
# replicated 1e10 key ranges, same lesson as _X above).
_TY = ("(user_id * 7919) % 4000 - 2000"
       " + ((event_id * 131) % 201 - 100)")
_TX = ("((user_id % 8000) * (user_id % 8000) * 31 + user_id * 104729)"
       " % 8000 - 4000 + ((event_id * 137) % 201 - 100)")
_TRAJ_R2 = 10_000  # Hausdorff gate: 100 centidegrees (= 1 cell), squared


@query("geo_trajectory_hausdorff", oracle=f"""
WITH pts AS (
  SELECT user_id AS uid, {_TY} AS y, {_TX} AS x FROM events
),
cells AS (
  SELECT DISTINCT uid, CAST(floor(y / 100.0) AS BIGINT) AS cy,
         CAST(floor(x / 100.0) AS BIGINT) AS cx
  FROM pts
),
ncells AS (SELECT uid, count(*) AS nc FROM cells GROUP BY 1),
probe AS (
  SELECT c.uid, c.cy, c.cx, c.cy + dy.d AS py, c.cx + dx.d AS px
  FROM cells c, (VALUES (-1),(0),(1)) dy(d), (VALUES (-1),(0),(1)) dx(d)
),
cover AS (
  SELECT p.uid AS ua, b.uid AS ub, p.cy, p.cx
  FROM probe p JOIN cells b ON p.py = b.cy AND p.px = b.cx AND p.uid <> b.uid
  GROUP BY 1, 2, 3, 4
),
covcnt AS (SELECT ua, ub, count(*) AS ncov FROM cover GROUP BY 1, 2),
cand AS (
  SELECT c1.ua AS ua, c1.ub AS ub
  FROM covcnt c1
  JOIN ncells na ON na.uid = c1.ua AND c1.ncov = na.nc
  JOIN covcnt c2 ON c2.ua = c1.ub AND c2.ub = c1.ua
  JOIN ncells nb ON nb.uid = c1.ub AND c2.ncov = nb.nc
  WHERE c1.ua < c1.ub
),
dmin AS (
  SELECT cand.ua AS ua, cand.ub AS ub, a.y, a.x,
         min((a.y - b.y) * (a.y - b.y) + (a.x - b.x) * (a.x - b.x)) AS md
  FROM cand JOIN pts a ON a.uid = cand.ua JOIN pts b ON b.uid = cand.ub
  GROUP BY 1, 2, 3, 4
),
hab AS (SELECT ua, ub, max(md) AS h2ab FROM dmin GROUP BY 1, 2),
dmin2 AS (
  SELECT cand.ua AS ua, cand.ub AS ub, b.y, b.x,
         min((a.y - b.y) * (a.y - b.y) + (a.x - b.x) * (a.x - b.x)) AS md
  FROM cand JOIN pts a ON a.uid = cand.ua JOIN pts b ON b.uid = cand.ub
  GROUP BY 1, 2, 3, 4
),
hba AS (SELECT ua, ub, max(md) AS h2ba FROM dmin2 GROUP BY 1, 2)
SELECT hab.ua AS ua, hab.ub AS ub, greatest(h2ab, h2ba) AS h2
FROM hab JOIN hba ON hab.ua = hba.ua AND hab.ub = hba.ub
WHERE greatest(h2ab, h2ba) <= {_TRAJ_R2}
""")
def geo_trajectory_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory similarity search (REPOSE, ICDE 2021 shape): find all
    user-trajectory pairs whose symmetric Hausdorff distance is within
    1° — "these two entities move through the same places" — without
    ever scoring all user pairs.

    Prune-then-verify, both stages cell-blocked and exact-integer:

    1. CELL-COVER PRUNE (sound for H <= cell size): if H(A,B) <= R and
       cells are R-sized, every cell of A must contain a point of A
       whose nearest B-point sits within the cell's 3x3 probe — so a
       pair where ANY a-cell sees no B-cell in its probe cannot pass
       the gate, in either direction. Cell sets are tiny (<= bbox of a
       ±1° trajectory), so this stage joins cell-level frames only:
       candidates emerge from an equi-join on probe cells, never a
       user-pair cross product.
    2. EXACT VERIFY on survivors: both directed Hausdorff halves from
       one orientation-doubled equi-join — min over partner points per
       (pair, point), max over points per direction, greatest of the
       two directions — all integer min/max on squared centidegree
       distances (no floats, no rounding: the oracle hash is exact).

    Scale: stage-1 cost is corpus-linear (cell frames) plus
    candidate-linear; stage-2 is candidates x |A| x |B| with point
    counts bounded per user. Under uniform-density replication
    candidate PAIRS grow ~density² — the geo_neighbor_haversine
    precedent: that is the workload's true output shape, not a plan
    failure. Like every dedup-family operator, the expensive stage
    runs only on pairs that survived a cheap sound prune."""
    e = table(spark, sf_dir, "events")
    pts = e.select(F.col("user_id").alias("uid"),
                   F.expr(_TY).alias("y"), F.expr(_TX).alias("x"))
    cells = (pts.select("uid", F.floor(F.col("y") / 100.0).alias("cy"),
                        F.floor(F.col("x") / 100.0).alias("cx"))
             .distinct())
    nc = cells.groupBy("uid").agg(F.count("*").alias("nc"))
    offs = F.array(*[F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                     for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    probe = (cells.select("uid", "cy", "cx", F.explode(offs).alias("o"))
             .select("uid", "cy", "cx",
                     (F.col("cy") + F.col("o.dy")).alias("py"),
                     (F.col("cx") + F.col("o.dx")).alias("px")))
    bc = cells.select(F.col("uid").alias("ub"), F.col("cy").alias("bcy"),
                      F.col("cx").alias("bcx"))
    cover = (probe.join(bc, (F.col("py") == F.col("bcy"))
                        & (F.col("px") == F.col("bcx"))
                        & (F.col("uid") != F.col("ub")))
             .select(F.col("uid").alias("ua"), "ub", "cy", "cx").distinct())
    covcnt = cover.groupBy("ua", "ub").agg(F.count("*").alias("ncov"))
    # directed full-coverage: every cell of ua sees ub in its probe
    full = (covcnt.join(nc.select(F.col("uid").alias("ua"),
                                  F.col("nc").alias("nca")), "ua")
            .filter(F.col("ncov") == F.col("nca")).select("ua", "ub"))
    cand = (full.join(full.select(F.col("ua").alias("ub"),
                                  F.col("ub").alias("ua")), ["ua", "ub"])
            .filter(F.col("ua") < F.col("ub")))
    orient = cand.unionByName(cand.select(F.col("ub").alias("ua"),
                                          F.col("ua").alias("ub")))
    a = pts.select(F.col("uid").alias("ua"), F.col("y").alias("ay"),
                   F.col("x").alias("ax"))
    b = pts.select(F.col("uid").alias("ub"), F.col("y").alias("by"),
                   F.col("x").alias("bx"))
    d2 = ((F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
          + (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")))
    hdir = (orient.join(a, "ua").join(b, "ub")
            .groupBy("ua", "ub", "ay", "ax")
            .agg(F.min(d2).alias("md"))
            .groupBy("ua", "ub").agg(F.max("md").alias("hd")))
    return (hdir.groupBy(F.least("ua", "ub").alias("ua"),
                         F.greatest("ua", "ub").alias("ub"))
            .agg(F.max("hd").alias("h2"))
            .filter(F.col("h2") <= _TRAJ_R2))
