"""Raster <-> vector bridge (engine extension named by the north rule).

The reference has no raster concept (it emits vector label discs only);
the north_rule's engine adds the standard tiling-stack pair:

- ``rasterize``: point/label rows -> Web-Mercator pixel grid per slippy
  tile (z, x, y, px_x, px_y, value). One groupBy on the pixel key — pure
  Catalyst floor/log/tan arithmetic (same mercator forward transform as
  operators/tiles.py), whole-stage codegen, shuffle keyed exactly like the
  downstream tile sink so no extra exchange is needed before writing.
- ``vectorize``: pixel grid -> vector rectangles (pixel bounds as 4-point
  rings in the polygons schema of operators/pip.py). Inverse mercator via
  exp/atan — also pure Catalyst, also SQL-expressible.

Scale notes: the pixel key (z, x, y, px, py) is high-cardinality and
near-uniform under the mercator transform, so the groupBy partial-
aggregates map-side and the shuffle carries only distinct touched pixels
(<= one row per pixel per map task); skewed megacity tiles stay bounded by
the pixel grid itself (max px*px rows per tile).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmgraft.operators.tiles import MAX_MERC_LAT


def _global_pixel(lat: Column, lon: Column, z: int, px: int) -> tuple[Column, Column]:
    """Web-Mercator global pixel coordinates at zoom z with px-wide tiles."""
    n = float((1 << z) * px)
    gx = F.floor((lon + 180.0) / 360.0 * n)
    latc = F.greatest(F.lit(-MAX_MERC_LAT), F.least(F.lit(MAX_MERC_LAT), lat))
    phi = F.radians(latc)
    gy = F.floor((1.0 - F.log(F.tan(phi) + 1.0 / F.cos(phi)) / math.pi) / 2.0 * n)
    gx = F.least(gx, F.lit(int(n) - 1)).cast("long")
    gy = F.least(F.greatest(gy, F.lit(0)), F.lit(int(n) - 1)).cast("long")
    return gx, gy


def rasterize(
    points: DataFrame,
    z: int,
    px: int = 256,
    value_col: str | None = None,
    agg: str = "count",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Points -> (tile_z, tile_x, tile_y, px_x, px_y, value) raster cells.

    ``agg``: 'count' (density), or 'sum'/'max'/'min' over ``value_col``
    (e.g. max importance per pixel for a label heatmap).
    """
    gx, gy = _global_pixel(F.col(lat_col), F.col(lon_col), z, px)
    cells = points.withColumn("_gx", gx).withColumn("_gy", gy)
    if agg == "count":
        value = F.count("*")
    elif agg in ("sum", "max", "min"):
        if value_col is None:
            raise ValueError(f"agg='{agg}' needs value_col")
        value = getattr(F, agg)(F.col(value_col))
    else:
        raise ValueError(f"unsupported agg '{agg}'")
    return (
        cells.groupBy("_gx", "_gy")
        .agg(value.alias("value"))
        .select(
            F.lit(z).alias("tile_z"),
            (F.col("_gx") / px).cast("long").alias("tile_x"),
            (F.col("_gy") / px).cast("long").alias("tile_y"),
            (F.col("_gx") % px).cast("long").alias("px_x"),
            (F.col("_gy") % px).cast("long").alias("px_y"),
            "value",
        )
    )


def vectorize(raster: DataFrame, px: int = 256) -> DataFrame:
    """Raster cells -> vector rectangles: one 4-corner ring per pixel in
    the (poly_id, value, ring_lats, ring_lons) shape pip_join consumes.
    Ring order: (south,west) (south,east) (north,east) (north,west).
    Inverse mercator lat = atan(sinh(pi*(1 - 2*gy/n))); sinh spelled with
    exp() so the DuckDB oracle runs the byte-identical formula.
    """
    n = F.pow(F.lit(2.0), F.col("tile_z")) * float(px)
    gx = F.col("tile_x") * px + F.col("px_x")
    gy = F.col("tile_y") * px + F.col("px_y")

    def inv_lat(gyc: Column) -> Column:
        a = math.pi - (2.0 * math.pi) * gyc / n
        return F.degrees(F.atan((F.exp(a) - F.exp(-a)) / 2.0))

    def inv_lon(gxc: Column) -> Column:
        return gxc / n * 360.0 - 180.0

    west, east = inv_lon(gx), inv_lon(gx + 1)
    north, south = inv_lat(gy), inv_lat(gy + 1)  # gy grows southward
    return raster.select(
        (gx * F.lit(1 << 32) + gy).alias("poly_id"),
        "tile_z",
        "tile_x",
        "tile_y",
        "px_x",
        "px_y",
        "value",
        F.array(south, south, north, north).alias("ring_lats"),
        F.array(west, east, east, west).alias("ring_lons"),
    )
