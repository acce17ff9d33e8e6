"""Geodesic polyline length + Douglas-Peucker simplification."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _ways(spark, rows):
    return spark.createDataFrame(
        rows, "way_id long, lats array<double>, lons array<double>"
    )


def _hav(la1, lo1, la2, lo2):
    p1, p2 = math.radians(la1), math.radians(la2)
    a = (
        math.sin(math.radians(la2 - la1) / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(math.radians(lo2 - lo1) / 2) ** 2
    )
    return 2 * 6371008.8 * math.asin(math.sqrt(a))


def test_polyline_length_matches_python_reference(spark):
    from osmgraft.operators.geom import polyline_length_m

    rows = [
        (1, [0.0, 0.0], [0.0, 1.0]),  # 1 deg of longitude at the equator
        (2, [10.0, 11.0, 12.0], [20.0, 20.5, 21.5]),
        (3, [5.0], [5.0]),  # single point -> 0
        (4, [], []),  # empty -> 0
    ]
    got = {
        r["way_id"]: r["length_m"]
        for r in _ways(spark, rows)
        .select("way_id", polyline_length_m(F.col("lats"), F.col("lons")).alias("length_m"))
        .collect()
    }
    for wid, las, los in rows:
        want = sum(
            _hav(las[i], los[i], las[i + 1], los[i + 1]) for i in range(len(las) - 1)
        )
        assert got[wid] == pytest.approx(want, rel=1e-12)
    # 1 degree of equatorial longitude ~ 111.2 km
    assert got[1] == pytest.approx(111194.9, abs=20.0)


def test_polyline_length_bit_parity_vs_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from osmgraft.operators.geom import polyline_length_m, polyline_length_oracle_sql

    rng = np.random.default_rng(9)
    rows = [
        (
            i,
            rng.uniform(-80, 80, rng.integers(2, 12)).tolist(),
            rng.uniform(-179, 179, rng.integers(2, 12)).tolist(),
        )
        for i in range(50)
    ]
    # equalize array lengths per row (parallel arrays)
    rows = [(i, la[: min(len(la), len(lo))], lo[: min(len(la), len(lo))]) for i, la, lo in rows]
    rows.append((900, [1.0], [1.0]))
    got = {
        r["way_id"]: r["length_m"]
        for r in _ways(spark, rows)
        .select("way_id", polyline_length_m(F.col("lats"), F.col("lons")).alias("length_m"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("create table ways(way_id bigint, lats double[], lons double[])")
    con.executemany("insert into ways values (?, ?, ?)", rows)
    sql = polyline_length_oracle_sql("select way_id, lats, lons from ways")
    for wid, length in con.execute(sql).fetchall():
        assert got[wid] == pytest.approx(length, rel=1e-9)


def test_simplify_straight_line_collapses_to_endpoints(spark):
    from osmgraft.operators.geom import simplify_polyline

    lats = [float(i) * 0.01 for i in range(100)]
    lons = [float(i) * 0.02 for i in range(100)]
    out = simplify_polyline(_ways(spark, [(1, lats, lons)]), 1e-9).collect()[0]
    assert out["n_points_in"] == 100
    assert out["n_points_out"] == 2
    assert out["lats"] == [lats[0], lats[-1]]
    assert out["lons"] == [lons[0], lons[-1]]


def test_simplify_preserves_significant_vertices(spark):
    from osmgraft.operators.geom import simplify_polyline

    # square-wave: every corner deviates ~0.5 deg from the chord
    lats, lons = [], []
    for i in range(20):
        lats.append(0.5 if i % 2 else 0.0)
        lons.append(float(i))
    out = simplify_polyline(_ways(spark, [(1, lats, lons)]), 0.05).collect()[0]
    assert out["n_points_out"] == 20  # every corner survives a tight tolerance
    loose = simplify_polyline(_ways(spark, [(1, lats, lons)]), 5.0).collect()[0]
    assert loose["n_points_out"] == 2  # everything within a loose tolerance


def test_simplify_error_bound_and_length_sanity(spark):
    """Every dropped vertex lies within tolerance of the simplified chain's
    corresponding chord (the DP guarantee), and simplified length <= input
    length (chords are never longer than the path)."""
    from osmgraft.operators.geom import polyline_length_m, simplify_polyline

    rng = np.random.default_rng(3)
    lats = np.cumsum(rng.normal(0, 0.05, 200)) + 40.0
    lons = np.cumsum(rng.normal(0.02, 0.02, 200)) + 7.0
    tol = 0.03
    df = _ways(spark, [(1, lats.tolist(), lons.tolist())])
    out = simplify_polyline(df, tol).collect()[0]
    kept = list(zip(out["lats"], out["lons"]))
    assert 2 <= len(kept) < 200

    # error bound: distance from every original vertex to its enclosing chord
    kept_idx = []
    j = 0
    for i, (la, lo) in enumerate(zip(lats, lons)):
        if j < len(kept) and abs(kept[j][0] - la) < 1e-12 and abs(kept[j][1] - lo) < 1e-12:
            kept_idx.append(i)
            j += 1
    assert len(kept_idx) == len(kept)
    for a, b in zip(kept_idx, kept_idx[1:]):
        ax, ay = lons[a], lats[a]
        dx, dy = lons[b] - ax, lats[b] - ay
        for i in range(a + 1, b):
            px, py = lons[i] - ax, lats[i] - ay
            n2 = dx * dx + dy * dy
            d = abs(px * dy - py * dx) / math.sqrt(n2) if n2 else math.hypot(px, py)
            assert d <= tol + 1e-12

    li = df.select(polyline_length_m(F.col("lats"), F.col("lons")).alias("m")).collect()[0]["m"]
    simp = _ways(spark, [(1, out["lats"], out["lons"])])
    lo_ = simp.select(polyline_length_m(F.col("lats"), F.col("lons")).alias("m")).collect()[0]["m"]
    assert lo_ <= li

    with pytest.raises(ValueError):
        simplify_polyline(df, -0.1)


def _ca_area(lats, lons):
    """Python reference: Chamberlain-Duquette spherical shoelace with the
    antimeridian delta-lon wrap."""
    n = len(lats)
    if n < 3:
        return 0.0
    s = 0.0
    for i in range(n):
        j = (i + 1) % n
        dlon = ((lons[j] - lons[i] + 540.0) % 360.0) - 180.0
        s += math.radians(dlon) * (
            2.0 + math.sin(math.radians(lats[i])) + math.sin(math.radians(lats[j]))
        )
    return abs(s) * 6371008.8**2 / 2.0


def _rings(spark, rows):
    return spark.createDataFrame(
        rows, "ring_id long, lats array<double>, lons array<double>"
    )


def test_ring_area_matches_reference_and_known_value(spark):
    from osmgraft.operators.geom import ring_area_m2

    rows = [
        (1, [0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0]),  # 1x1 deg at equator
        (2, [50.0, 50.0, 51.0, 51.0], [7.0, 8.5, 8.5, 7.0]),  # mid-lat box
        (3, [10.0, 12.0, 11.0], [20.0, 20.0, 22.0]),  # triangle
        (4, [5.0, 6.0], [5.0, 6.0]),  # degenerate -> 0
        (5, [], []),  # empty -> 0
    ]
    got = {
        r["ring_id"]: r["area_m2"]
        for r in _rings(spark, rows)
        .select("ring_id", ring_area_m2(F.col("lats"), F.col("lons")).alias("area_m2"))
        .collect()
    }
    for rid, las, los in rows:
        assert got[rid] == pytest.approx(_ca_area(las, los), rel=1e-12)
    # 1x1 deg at the equator ~ 111.19^2 km^2 ~ 1.236e10 m^2 (within 0.1%)
    assert got[1] == pytest.approx(1.2364e10, rel=1e-3)
    assert got[4] == 0.0 and got[5] == 0.0
    # orientation invariance: reversed ring gives the same area
    rev = _rings(spark, [(9, rows[1][1][::-1], rows[1][2][::-1])])
    a9 = rev.select(ring_area_m2(F.col("lats"), F.col("lons")).alias("a")).collect()[0]["a"]
    assert a9 == pytest.approx(got[2], rel=1e-12)


def test_ring_area_parity_vs_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from osmgraft.operators.geom import ring_area_m2, ring_area_oracle_sql

    rng = np.random.default_rng(11)
    rows = []
    for i in range(40):
        k = int(rng.integers(3, 9))
        cx, cy = rng.uniform(-60, 60), rng.uniform(-120, 120)
        ang = np.sort(rng.uniform(0, 2 * math.pi, k))
        rad = rng.uniform(0.3, 5.0)
        rows.append((i, (cx + rad * np.sin(ang)).tolist(), (cy + rad * np.cos(ang)).tolist()))
    rows.append((900, [1.0, 2.0], [1.0, 2.0]))
    got = {
        r["ring_id"]: r["area_m2"]
        for r in _rings(spark, rows)
        .select("ring_id", ring_area_m2(F.col("lats"), F.col("lons")).alias("area_m2"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("create table rings(ring_id bigint, lats double[], lons double[])")
    con.executemany("insert into rings values (?, ?, ?)", rows)
    sql = ring_area_oracle_sql("select ring_id, lats, lons from rings")
    for rid, area in con.execute(sql).fetchall():
        assert got[rid] == pytest.approx(area, rel=1e-9)


def test_ring_area_antimeridian_crossing(spark):
    """A small box straddling lon=180 must equal the same-shaped box away
    from the seam, not a 360-degree-wide monster."""
    from osmgraft.operators.geom import ring_area_m2

    seam = (1, [10.0, 10.0, 11.0, 11.0], [179.5, -179.5, -179.5, 179.5])
    plain = (2, [10.0, 10.0, 11.0, 11.0], [0.0, 1.0, 1.0, 0.0])
    got = {
        r["ring_id"]: r["area_m2"]
        for r in _rings(spark, [seam, plain])
        .select("ring_id", ring_area_m2(F.col("lats"), F.col("lons")).alias("area_m2"))
        .collect()
    }
    assert got[1] == pytest.approx(got[2], rel=1e-9)
    assert got[1] == pytest.approx(_ca_area(*seam[1:]), rel=1e-12)


def _centroids(spark, rows):
    from osmgraft.operators.geom import ring_centroid

    df = spark.createDataFrame(rows, "ring_id long, lats array<double>, lons array<double>")
    c = ring_centroid(F.col("lats"), F.col("lons"))
    return {
        r["ring_id"]: (r["c"]["lat"], r["c"]["lon"])
        for r in df.select("ring_id", c.alias("c")).collect()
    }


def test_ring_centroid_square_and_orientation(spark):
    sq_ccw = (1, [0.0, 0.0, 2.0, 2.0], [0.0, 2.0, 2.0, 0.0])
    sq_cw = (2, [0.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0])
    got = _centroids(spark, [sq_ccw, sq_cw])
    # a square's centroid is its center, independent of winding
    assert got[1] == pytest.approx((1.0, 1.0), abs=1e-12)
    assert got[2] == pytest.approx((1.0, 1.0), abs=1e-12)


def test_ring_centroid_concave_differs_from_vertex_mean(spark):
    # L-shape made of a 3x1 foot plus a 1x2 column (total area 5),
    # symmetric under lat<->lon swap; decomposing into rectangles gives
    # the area-weighted centroid (1.1, 1.1)
    lshape = (
        7,
        [0.0, 0.0, 1.0, 1.0, 3.0, 3.0],   # lat = y
        [0.0, 3.0, 3.0, 1.0, 1.0, 0.0],   # lon = x
    )
    got = _centroids(spark, [lshape])
    clat, clon = got[7]
    assert clat == pytest.approx(1.1, abs=1e-12)
    assert clon == pytest.approx(1.1, abs=1e-12)
    # vertex average is NOT the area centroid for concave rings
    assert abs(sum(lshape[1]) / 6 - clat) > 0.1


def test_ring_centroid_degenerate_falls_back_to_mean(spark):
    collinear = (3, [0.0, 1.0, 2.0], [0.0, 1.0, 2.0])
    two_pts = (4, [5.0, 7.0], [10.0, 12.0])
    got = _centroids(spark, [collinear, two_pts])
    assert got[3] == pytest.approx((1.0, 1.0), abs=1e-12)
    assert got[4] == pytest.approx((6.0, 11.0), abs=1e-12)


def _point_at(spark, rows, frac):
    from osmgraft.operators.geom import polyline_point_at

    df = spark.createDataFrame(rows, "way_id long, lats array<double>, lons array<double>")
    p = polyline_point_at(F.col("lats"), F.col("lons"), frac=frac)
    return {r["way_id"]: (r["p"]["lat"], r["p"]["lon"]) for r in df.select("way_id", p.alias("p")).collect()}


def test_point_at_midpoint_of_uniform_line(spark):
    # equator line, 3 equal segments: frac=0.5 is mid of segment 2
    line = [(1, [0.0, 0.0, 0.0, 0.0], [0.0, 1.0, 2.0, 3.0])]
    lat, lon = _point_at(spark, line, 0.5)[1]
    assert lat == pytest.approx(0.0, abs=1e-12)
    assert lon == pytest.approx(1.5, abs=1e-9)


def test_point_at_endpoints_and_single_point(spark):
    line = [(1, [10.0, 20.0], [30.0, 40.0]), (2, [5.0], [6.0])]
    assert _point_at(spark, line, 0.0)[1] == pytest.approx((10.0, 30.0), abs=1e-12)
    assert _point_at(spark, line, 1.0)[1] == pytest.approx((20.0, 40.0), abs=1e-9)
    assert _point_at(spark, line, 0.5)[2] == (5.0, 6.0)


def test_point_at_skips_zero_length_segments(spark):
    # duplicate vertex mid-line: walk must not divide by zero
    line = [(3, [0.0, 0.0, 0.0, 0.0], [0.0, 1.0, 1.0, 2.0])]
    lat, lon = _point_at(spark, line, 0.5)[3]
    assert lat == pytest.approx(0.0, abs=1e-12)
    assert lon == pytest.approx(1.0, abs=1e-9)
