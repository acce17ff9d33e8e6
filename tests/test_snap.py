from __future__ import annotations

import math

import numpy as np
import pytest

from osmgraft.operators.knn import DEG_M
from osmgraft.operators.snap import snap_join


def _brute(points, segments, radius_m):
    """Reference nearest-segment search with the operator's own distance
    definition, computed independently in numpy."""
    out = {}
    r2 = (radius_m / DEG_M) ** 2
    for pid, (py, px) in points.items():
        c = math.cos(math.radians(py))
        best = None
        for sid, (y1, x1, y2, x2) in segments.items():
            ax, ay = (x1 - px) * c, y1 - py
            bx, by = (x2 - px) * c, y2 - py
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            t = max(0.0, min(1.0, -(ax * dx + ay * dy) / len2)) if len2 > 0 else 0.0
            ex, ey = ax + t * dx, ay + t * dy
            d2 = ex * ex + ey * ey
            if d2 <= r2 and (best is None or (d2, sid) < best):
                best = (d2, sid)
        if best is not None:
            out[pid] = best[1]
    return out


def _dfs(spark, points, segments):
    pdf = spark.createDataFrame(
        [(int(i), float(y), float(x)) for i, (y, x) in points.items()],
        "pid long, lat double, lon double",
    )
    sdf = spark.createDataFrame(
        [(int(i), float(a), float(b), float(c), float(d)) for i, (a, b, c, d) in segments.items()],
        "sid long, lat1 double, lon1 double, lat2 double, lon2 double",
    )
    return pdf, sdf


@pytest.mark.parametrize("seed,radius_km", [(5, 150.0), (9, 60.0)])
def test_snap_matches_brute_force(spark, seed, radius_km):
    rng = np.random.default_rng(seed)
    points = {
        i: (float(rng.uniform(-65, 65)), float(rng.uniform(-170, 170))) for i in range(300)
    }
    segments = {}
    for i in range(80):
        y1 = float(rng.uniform(-65, 65))
        x1 = float(rng.uniform(-170, 170))
        segments[i] = (y1, x1, y1 + float(rng.uniform(-3, 3)), x1 + float(rng.uniform(-3, 3)))
    want = _brute(points, segments, radius_km * 1000)
    assert want, "no point had a segment in range — vacuous"
    pdf, sdf = _dfs(spark, points, segments)
    got = {r.pid: r.sid for r in snap_join(pdf, sdf, radius_km * 1000).collect()}
    assert got == want


def test_snap_degenerate_and_duplicates(spark):
    # zero-length segment (guarded projection) + two equidistant segments
    # (tie must break to the lower sid) + an out-of-range point
    points = {0: (10.0, 20.0), 1: (50.0, 100.0)}
    segments = {
        7: (10.5, 20.0, 10.5, 20.0),  # zero-length, 0.5 deg above point 0
        3: (9.5, 19.0, 9.5, 21.0),    # horizontal, 0.5 deg below point 0
    }
    pdf, sdf = _dfs(spark, points, segments)
    rows = {r.pid: (r.sid, r.dist_m) for r in snap_join(pdf, sdf, 100_000).collect()}
    assert set(rows) == {0}
    sid, dist = rows[0]
    assert sid == 3  # tie at 0.5 deg -> lower sid wins
    assert dist == pytest.approx(0.5 * DEG_M, rel=1e-9)


def test_snap_distance_value(spark):
    # point offset purely in longitude: distance must carry the cos(lat)
    # equirectangular scaling
    points = {0: (60.0, 10.0)}
    segments = {1: (59.0, 11.0, 61.0, 11.0)}  # vertical segment 1 deg east
    pdf, sdf = _dfs(spark, points, segments)
    [row] = snap_join(pdf, sdf, 200_000).collect()
    assert row.dist_m == pytest.approx(math.cos(math.radians(60.0)) * DEG_M, rel=1e-9)
