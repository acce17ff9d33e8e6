from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.operators.layout import geohash

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Independent reference: the textbook bisection algorithm."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, bit, even = [], 0, True
    out = []
    ch = 0
    n = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch = ch << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch = ch << 1
                lat_hi = mid
        even = not even
        n += 1
        if n == 5:
            out.append(_GH32[ch])
            ch, n = 0, 0
    return "".join(out)


def test_reference_known_vector():
    # the canonical public example
    assert _ref_geohash(57.64911, 10.40744, 11) == "u4pruydqqvj"


@pytest.mark.parametrize("precision", [1, 2, 5, 7, 12])
def test_geohash_matches_bisection(spark, precision):
    rng = np.random.default_rng(13)
    pts = [(i, float(rng.uniform(-90, 90)), float(rng.uniform(-180, 180))) for i in range(400)]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    got = {
        r.pid: r.gh
        for r in df.select("pid", geohash(F.col("lat"), F.col("lon"), precision).alias("gh")).collect()
    }
    for pid, lat, lon in pts:
        assert got[pid] == _ref_geohash(lat, lon, precision), (pid, lat, lon)


def test_geohash_boundaries(spark):
    pts = [(0, 90.0, 180.0), (1, -90.0, -180.0), (2, 0.0, 0.0), (3, 89.999999, 179.999999)]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    got = {r.pid: r.gh for r in df.select("pid", geohash(F.col("lat"), F.col("lon"), 8).alias("gh")).collect()}
    # poles/antimeridian clamp into the top cell; everything 8 chars
    assert all(len(v) == 8 for v in got.values())
    assert got[1] == _ref_geohash(-90.0, -180.0, 8) == "00000000"
    assert got[2] == _ref_geohash(0.0, 0.0, 8)
    assert got[3] == _ref_geohash(89.999999, 179.999999, 8)
    # lat=90/lon=180 clamp to the same cell as just-below values
    assert got[0] == got[3]


def test_geohash_prefix_containment(spark):
    # precision p hash of a point is a prefix of its precision p+2 hash —
    # the property joins/partitioning rely on
    rng = np.random.default_rng(29)
    pts = [(i, float(rng.uniform(-85, 85)), float(rng.uniform(-175, 175))) for i in range(100)]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    rows = df.select(
        geohash(F.col("lat"), F.col("lon"), 4).alias("g4"),
        geohash(F.col("lat"), F.col("lon"), 6).alias("g6"),
    ).collect()
    assert all(r.g6.startswith(r.g4) for r in rows)


def test_geohash_bad_precision():
    with pytest.raises(ValueError):
        geohash(F.lit(0.0), F.lit(0.0), 0)
    with pytest.raises(ValueError):
        geohash(F.lit(0.0), F.lit(0.0), 13)


def test_quadkey_known_value_and_prefix_property(spark):
    from pyspark.sql import functions as F

    from osmgraft.operators.layout import quadkey
    from osmgraft.operators.tiles import tile_xy

    # textbook Bing example: tile (3, 5) at z3 -> quadkey "213"
    df = spark.createDataFrame([(40.0, -15.0)], "lat double, lon double")
    tx, ty = tile_xy(F.col("lat"), F.col("lon"), 3)
    row = df.select(
        tx.alias("tx"), ty.alias("ty"), quadkey(F.col("lat"), F.col("lon"), 3).alias("qk")
    ).collect()[0]
    # derive expected digits from the tile coords directly
    exp = "".join(
        str(((row["ty"] >> k) & 1) * 2 + ((row["tx"] >> k) & 1)) for k in (2, 1, 0)
    )
    assert row["qk"] == exp

    # prefix property: z-1 quadkey is the z quadkey minus its last digit
    pts = spark.createDataFrame(
        [(48.8584, 2.2945), (-33.857, 151.215), (0.0, 0.0)], "lat double, lon double"
    )
    both = pts.select(
        quadkey(F.col("lat"), F.col("lon"), 10).alias("q10"),
        quadkey(F.col("lat"), F.col("lon"), 9).alias("q9"),
    ).collect()
    for r in both:
        assert len(r["q10"]) == 10 and len(r["q9"]) == 9
        assert r["q10"][:9] == r["q9"]


def test_quadkey_bad_zoom_raises(spark):
    import pytest
    from pyspark.sql import functions as F

    from osmgraft.operators.layout import quadkey

    with pytest.raises(ValueError, match="z must be"):
        quadkey(F.col("lat"), F.col("lon"), 0)
