"""Great-circle (haversine) spatial operators — the float-geometry
companion to the integer flat-grid family in ``suite/geo.py``.

The flat-grid queries stay oracle-exact by construction (integer
centidegree metric); real deployments need metric-correct distances, so
this module supplies the haversine verify step and a latitude-aware
cell-blocked neighbor join around it. Trig results differ between
engines in the last ulp (JVM ``Math`` vs C libm), so this family is
gated by float-tolerant property tests against a brute-force oracle
(tests/test_spatial.py) instead of a value-hash SQL oracle — the gate
checks the PAIR SET exactly and the distances to relative tolerance.

Scale posture: blocking is the geohash pattern with a latitude-aware
probe width — the subtlety a naive square grid gets wrong: a fixed
longitude-cell width stops covering the search radius as meridians
converge, so each point computes how many longitude cells its radius
spans AT THE MOST POLEWARD LATITUDE IT CAN REACH and probes exactly
that ring segment (modulo the antimeridian wrap, which the flat grid
also ignored but a sphere cannot). Near the poles (cos -> 0) the probe
degrades to the full ring — the polar-cap fallback every production
cell library (S2/H3) solves structurally; a full ring of
``360/cell_deg`` cells is the bounded worst case here. Candidates stay
proportional to local density x probed cells; no all-pairs path exists.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_008.8  # IUGG mean Earth radius
_M_PER_LAT_DEG = 111_194.0    # EARTH_RADIUS_M * pi / 180, rounded DOWN so
# every latitude bound derived from it over-covers (meridians are great
# circles, so the latitude conversion itself is exact on the sphere)


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between two (degree) coordinate
    pairs as a pure codegen column expression — stays JVM-side, no UDF."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp, dl = F.radians(lat2 - lat1), F.radians(lon2 - lon1)
    a = (F.pow(F.sin(dp / 2), 2)
         + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / 2), 2))
    # clamp against rounding drift at antipodal points before asin
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def neighbor_join_haversine(points: DataFrame, radius_m: float,
                            id_col: str = "id", lat_col: str = "lat",
                            lon_col: str = "lon") -> DataFrame:
    """All point pairs within ``radius_m`` great-circle meters, each
    pair exactly once (``id_a < id_b``), with ``dist_m``.

    Blocking: square cells of ``cell_deg`` latitude degrees (sized so
    one cell covers the radius in latitude). Side A explodes to its
    probe window — 3 latitude rows x a PER-POINT longitude span wide
    enough at the most poleward reachable latitude — side B keeps its
    home cell, and one equi-join on the cell key produces candidates;
    the haversine predicate verifies as a residual filter. Longitude
    cells wrap modulo the ring so antimeridian-crossing pairs are
    found."""
    # One latitude cell must cover the radius (cell_deg >= radius in
    # lat degrees), AND cell_deg must DIVIDE 360: otherwise the seam
    # cell at the antimeridian is narrower than cell_deg, the kx-cell
    # probe window (sized assuming uniform width) falls one index short
    # across the seam, and in-radius pairs straddling it are silently
    # lost (caught by review: radius 700 km -> cell 7, ring 52, seam
    # cell spans 3 degrees; tests::test_neighbor_join_seam_cell_divisor).
    need = min(max(1, int(-(-radius_m // _M_PER_LAT_DEG))), 360)
    cell_deg = next(d for d in (1, 2, 3, 4, 5, 6, 8, 9, 10, 12, 15, 18,
                                20, 24, 30, 36, 40, 45, 60, 72, 90, 120,
                                180, 360) if d >= need)
    ring = 360 // cell_deg
    lat, lon = F.col(lat_col), F.col(lon_col)
    cy = F.floor((lat + 90.0) / cell_deg).cast("int")
    cx = F.pmod(F.floor((lon + 180.0) / cell_deg).cast("int"), F.lit(ring))
    home = points.select(
        F.col(id_col).alias("id_b"), lat.alias("lat_b"), lon.alias("lon_b"),
        cy.alias("cy"), cx.alias("cx"))
    # most poleward latitude reachable from this point within the radius
    reach = F.least(F.abs(lat) + F.lit(radius_m / _M_PER_LAT_DEG),
                    F.lit(90.0))
    coslat = F.cos(F.radians(reach))
    # Maximum longitude separation of any in-radius pair, from the
    # haversine inversion  dlon <= 2 asin(sin(r/2R) / sqrt(cos f1 cos f2))
    # evaluated at the reach latitude: both pair latitudes are <= reach,
    # so cos(reach) <= sqrt(cos f1 cos f2) and this bound dominates
    # every pair geometry (proof: haversine formula with the dlat term
    # dropped only loosens it). The linear small-angle estimate
    # radius/(R cos f) UNDERCOUNTS the exact inversion by up to ~0.6%
    # near the poles (a parallel is a chord, not a great circle) —
    # enough to cross a cell boundary and silently drop a boundary pair
    # (tests::test_neighbor_join_highlat_chord_sliver), so the asin
    # form is load-bearing, not pedantry. Full ring when the parallel
    # is shorter than the radius (polar cap: asin argument >= 1).
    sin_half = F.lit(math.sin(radius_m / (2.0 * EARTH_RADIUS_M)))
    kx = F.when(sin_half / coslat >= 1.0, F.lit(ring // 2)) \
          .otherwise(F.ceil(F.degrees(2 * F.asin(sin_half / coslat))
                            / F.lit(float(cell_deg))).cast("int"))
    probe = (points.select(
                F.col(id_col).alias("id_a"), lat.alias("lat_a"),
                lon.alias("lon_a"), cy.alias("pcy"), cx.alias("pcx"),
                kx.alias("kx"))
             .select("id_a", "lat_a", "lon_a", "pcy", "pcx",
                     F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dy"),
                     "kx")
             .select("id_a", "lat_a", "lon_a",
                     (F.col("pcy") + F.col("dy")).alias("cy"), "pcx", "kx")
             .select("id_a", "lat_a", "lon_a", "cy", "pcx",
                     # probe span never exceeds one full ring, so each
                     # cell appears once — no dedup shuffle needed
                     F.explode(F.sequence(
                         -F.col("kx"),
                         -F.col("kx")
                         + F.least(F.col("kx") * 2 + 1, F.lit(ring)) - 1))
                      .alias("dx"))
             .select("id_a", "lat_a", "lon_a", "cy",
                     F.pmod(F.col("pcx") + F.col("dx"), F.lit(ring))
                      .alias("cx")))
    d = haversine_m(F.col("lat_a"), F.col("lon_a"),
                    F.col("lat_b"), F.col("lon_b"))
    return (probe.join(home, ["cy", "cx"])
                 .filter(F.col("id_a") < F.col("id_b"))
                 .withColumn("dist_m", d)
                 .filter(F.col("dist_m") <= radius_m)
                 .select("id_a", "id_b", "dist_m"))
