"""Float-tolerant gates for the haversine spatial family: the blocked
neighbor join must return EXACTLY the brute-force pair set (blocking may
never lose a pair), with distances matching a pure-Python haversine to
relative tolerance. Adversarial placements cover the blocking's failure
modes: antimeridian wrap, polar cap, and cell-boundary straddling.
"""

from __future__ import annotations

import math

import pytest

from zoom_etl_spark.operators.spatial import (
    EARTH_RADIUS_M, haversine_m, neighbor_join_haversine,
)


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = (math.sin(dp / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(min(a, 1.0)))


def _brute(pts, radius):
    out = {}
    for i, (ia, la, lo) in enumerate(pts):
        for ib, lb, lo2 in pts[i + 1:]:
            d = _hav(la, lo, lb, lo2)
            if d <= radius:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                out[(a, b)] = d
    return out


def _check(spark, pts, radius):
    df = spark.createDataFrame(pts, "id BIGINT, lat DOUBLE, lon DOUBLE")
    got = {(r.id_a, r.id_b): r.dist_m
           for r in neighbor_join_haversine(df, radius).collect()}
    want = _brute(pts, radius)
    assert set(got) == set(want), (
        f"missing={set(want) - set(got)} extra={set(got) - set(want)}")
    for k, d in want.items():
        assert got[k] == pytest.approx(d, rel=1e-9), (k, got[k], d)


def test_haversine_matches_reference(spark):
    rows = [(0.0, 0.0, 0.0, 1.0), (52.52, 13.405, 48.8566, 2.3522),
            (89.9, 10.0, 89.9, -170.0), (-33.9, 151.2, 40.7, -74.0)]
    df = spark.createDataFrame(
        rows, "lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE")
    import pyspark.sql.functions as F
    got = df.select(haversine_m(
        F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
        .alias("d")).collect()
    for r, row in zip(got, rows):
        assert r.d == pytest.approx(_hav(*row), rel=1e-9)


def test_neighbor_join_synthetic_corpus(spark, sf_dir):
    """The registered query's own point derivation vs brute force."""
    from zoom_etl_spark.suite.geo import _points
    import pyspark.sql.functions as F
    p = (_points(spark, sf_dir)
         .select("id", (F.col("y") / 100.0).alias("lat"),
                 (F.col("x") / 100.0).alias("lon")))
    pts = [(r.id, r.lat, r.lon) for r in p.collect()]
    _check(spark, pts, 500_000.0)


def test_neighbor_join_antimeridian_and_poles(spark):
    pts = [
        (1, 10.0, 179.9), (2, 10.0, -179.9),      # wrap pair (~22 km)
        (3, 89.8, 0.0), (4, 89.8, 180.0),         # across the pole
        (5, 89.5, -90.0),                          # polar cap member
        (6, -89.9, 45.0), (7, -89.7, -135.0),      # south polar pair
        (8, 0.0, 0.0), (9, 0.1, 0.1),              # equator near pair
        (10, 45.0, 30.0), (11, 45.0, 37.0),        # ~550 km: outside
        (12, 60.0, 100.0), (13, 60.1, 100.2),      # high-lat near pair
        (14, -45.0, -0.05), (15, -45.0, 0.05),     # prime-meridian cell edge
    ]
    _check(spark, pts, 500_000.0)


def test_neighbor_join_cell_boundary_sweep(spark):
    """Pairs straddling every probe-window edge: points laid just inside
    /outside the radius along latitude and longitude from anchors on
    cell corners — blocking must agree with brute force everywhere."""
    pts, nid = [], 1
    for alat, alon in [(-0.01, -0.01), (44.99, 89.99), (-60.01, 0.01),
                       (80.0, 179.99)]:
        pts.append((nid, alat, alon)); nid += 1
        for dlat, dlon in [(4.4, 0.0), (4.6, 0.0), (0.0, 4.4), (0.0, 6.0),
                           (-4.4, 0.0), (3.2, 3.2), (-3.1, -3.1)]:
            lat = max(min(alat + dlat, 89.99), -89.99)
            lon = ((alon + dlon + 180.0) % 360.0) - 180.0
            pts.append((nid, lat, lon)); nid += 1
    _check(spark, pts, 500_000.0)


def test_neighbor_join_highlat_chord_sliver(spark):
    """Regression for the subtlest blocking bug: at high latitude the
    exact max longitude separation within the radius
    (2·asin(sin(r/2R)/cosφ)) exceeds the linear estimate r/(R·cosφ) by
    up to ~0.6% — a probe span sized from the linear estimate can fall
    one cell short. Constructs pairs AT that sliver: latitudes where
    ceil(exact/cell) > ceil(linear/cell), anchor longitude just under a
    cell boundary (max cell span), partner at just-inside-the-radius
    separation."""
    from zoom_etl_spark.operators.spatial import (
        EARTH_RADIUS_M, _M_PER_LAT_DEG,
    )
    radius, cell = 250_000.0, 3.0
    sin_half = math.sin(radius / (2.0 * EARTH_RADIUS_M))
    pts, nid = [], 1
    found_sliver = False
    lat = 80.0
    while lat < 86.5:
        c = math.cos(math.radians(min(abs(lat) + radius / _M_PER_LAT_DEG,
                                      90.0)))
        if sin_half / c < 1.0:
            exact = math.degrees(2 * math.asin(sin_half / c))
            linear = radius / (math.cos(math.radians(lat))
                               * (EARTH_RADIUS_M * math.pi / 180.0))
            if math.ceil(exact / cell) > math.ceil(linear / cell):
                found_sliver = True
                # dlon just inside the radius AT THIS latitude
                dl = math.degrees(2 * math.asin(
                    sin_half / math.cos(math.radians(lat)))) * 0.9995
                anchor = cell * 5 - 0.0005  # hugs a cell boundary
                pts.append((nid, lat, anchor)); nid += 1
                pts.append((nid, lat, anchor + dl)); nid += 1
        lat += 0.01
    assert found_sliver, "sweep never crossed a linear/exact cell boundary"
    _check(spark, pts, radius)


def test_neighbor_join_seam_cell_divisor(spark):
    """Regression (review finding): when the naive cell width does not
    divide 360, the antimeridian seam cell is narrower than every other
    cell and a uniform-width probe window falls one index short across
    the seam. radius 700 km needs 7-degree cells (ring would be 52 with
    a 3-degree seam cell); the pair at lon 176.95 / -176.85 (~689 km
    apart at the equator) must be found."""
    pts = [
        (1, 0.0, 176.95), (2, 0.0, -176.85),   # ~689 km across the seam
        (3, 45.0, 179.5), (4, 45.0, -179.5),   # high-lat seam pair
        (5, -30.0, 100.0), (6, -30.0, 107.4),  # same-side near pair
        (7, 10.0, 50.0), (8, 10.0, 60.0),      # ~1094 km: outside
    ]
    _check(spark, pts, 700_000.0)


def test_equalarea_banding_is_monotonic_and_balanced():
    """The integer Bhaskara sine that DEFINES geo_equalarea_rollup's
    bands must be (a) monotonic over the full centidegree latitude
    range (a non-monotonic cell id would tear bands), (b) within its
    documented ~1.6e-3 error of true sine, and (c) produce 12 bands
    each covering 1/12 of sin-lat space within 1% — the equal-area
    property itself."""
    import math

    def isin(y):
        t = abs(y) * (18000 - abs(y))
        s = (4 * t * 1000000) // (405000000 - t)
        return -s if y < 0 else s

    prev, maxerr, bands = None, 0.0, {}
    for y in range(-9000, 9000):
        s = isin(y)
        assert prev is None or s >= prev, y
        prev = s
        maxerr = max(maxerr, abs(s / 1e6 - math.sin(math.radians(y / 100))))
        b = (12 * (s + 1000000)) // 2000000
        lo, hi = bands.get(b, (y, y))
        bands[b] = (min(lo, y), max(hi, y))
    assert maxerr < 1.7e-3
    assert sorted(bands) == list(range(12))
    for lo, hi in bands.values():
        frac = (math.sin(math.radians((hi + 1) / 100))
                - math.sin(math.radians(lo / 100))) / 2
        assert abs(frac - 1 / 12) < 1 / 1200


def test_haversine_oracle_guard_band(spark, sf_dir):
    """The oracle-gated geo_neighbor_haversine hashes km-FLOORED
    distances; that is only engine-stable if no pair's distance sits
    near a quantization boundary (floor flip) or near the 250 km
    cutoff (pair-set flip). Engine trig divergence is a few ulp
    (~1e-7 m here); require 6 orders of magnitude more margin. A
    testdata regen that lands a pair on a boundary fails HERE, loudly,
    not in the driver's hash compare."""
    from zoom_etl_spark.suite.geo import _points
    import pyspark.sql.functions as F
    from zoom_etl_spark.operators.spatial import neighbor_join_haversine
    p = (_points(spark, sf_dir)
         .select("id", (F.col("y") / 100.0).alias("lat"),
                 (F.col("x") / 100.0).alias("lon")))
    pairs = neighbor_join_haversine(p, radius_m=250_000.0 + 10.0)
    row = pairs.agg(
        F.min(F.abs(F.col("dist_m") - 250_000.0)).alias("cutoff_gap"),
        F.min(F.when(F.col("dist_m") <= 250_000.0, F.least(
            F.col("dist_m") - F.floor(F.col("dist_m") / 1000) * 1000,
            F.ceil(F.col("dist_m") / 1000) * 1000 - F.col("dist_m"))))
         .alias("km_floor_gap")).first()
    assert row.cutoff_gap > 1e-3, row     # >= 1 mm from the 250 km line
    assert row.km_floor_gap > 1e-4, row   # >= 0.1 mm from a km boundary


def test_trajectory_hausdorff_equals_brute_force(spark, sf_dir):
    """Prune soundness + verify exactness in one assertion: the
    cell-cover-blocked query's output at the fixture SF must equal the
    brute-force symmetric Hausdorff over ALL user pairs (numpy, exact
    integers) gated at the same threshold. A prune that drops a true
    pair, or a verify that mis-aggregates, both break equality. The
    numpy all-pairs loop is feasible through sf0.01; larger fixture SFs
    skip rather than run an hours-long quadratic reference."""
    import numpy as np

    from zoom_etl_spark.registry import queries

    import os

    sf = sf_dir
    n_events = spark.read.parquet(f"{sf}/events.parquet").count()
    if not (5_000 <= n_events <= 200_000) and os.path.isdir(
            "/root/testdata/sf0.01"):
        # Too small (sf0.001: ~15 users, ZERO pairs within threshold —
        # parity would hold vacuously) or too big (the numpy all-pairs
        # reference is quadratic): fall back to sf0.01, the one
        # fixture SF where the check is both non-degenerate and
        # feasible — never skip the prune-soundness gate outright.
        sf = "/root/testdata/sf0.01"
    got = {(r.ua, r.ub): r.h2 for r in
           queries()["geo_trajectory_hausdorff"](spark, sf).collect()}

    import duckdb
    con = duckdb.connect()
    rows = con.sql(f"""
        SELECT user_id,
               (user_id * 7919) % 4000 - 2000
                 + ((event_id * 131) % 201 - 100) AS y,
               ((user_id % 8000) * (user_id % 8000) * 31
                 + user_id * 104729) % 8000 - 4000
                 + ((event_id * 137) % 201 - 100) AS x
        FROM '{sf}/events.parquet'""").fetchall()
    by_uid: dict = {}
    for uid, y, x in rows:
        by_uid.setdefault(uid, []).append((y, x))
    pts = {u: np.array(v, dtype=np.int64) for u, v in by_uid.items()}

    def h2(a, b):
        d = ((a[:, None, 0] - b[None, :, 0]) ** 2
             + (a[:, None, 1] - b[None, :, 1]) ** 2)
        return max(d.min(axis=1).max(), d.min(axis=0).max())

    uids = sorted(pts)
    want = {}
    for i, ua in enumerate(uids):
        for ub in uids[i + 1:]:
            # cheap bbox prune for the TEST loop only (exactness-safe:
            # if bboxes are > R apart on an axis, H > R)
            if (abs(int(pts[ua][:, 0].min()) - int(pts[ub][:, 0].min()))
                    > 2500):
                continue
            v = int(h2(pts[ua], pts[ub]))
            if v <= 10_000:
                want[(ua, ub)] = v
    assert got == want and len(want) > 0
