"""Tile assignment for the label-placement tiler (engine extension).

Assigns each label to a Web-Mercator slippy tile (z, x, y) and orders
labels within a tile by global importance (reuses O1/O2). Pure Catalyst
arithmetic — floor/log/tan expressions, fully SQL-expressible (the DuckDB
oracle runs the identical formula).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MAX_MERC_LAT = 85.05112878  # Web-Mercator clamp


def tile_xy(lat: Column, lon: Column, z: int) -> tuple[Column, Column]:
    n = float(1 << z)
    x = F.floor((lon + 180.0) / 360.0 * n)
    latc = F.greatest(F.lit(-MAX_MERC_LAT), F.least(F.lit(MAX_MERC_LAT), lat))
    phi = F.radians(latc)
    y = F.floor((1.0 - F.log(F.tan(phi) + 1.0 / F.cos(phi)) / math.pi) / 2.0 * n)
    # clamp x for lon == 180.0 exactly
    x = F.least(x, F.lit(int(n) - 1)).cast("long")
    y = F.least(F.greatest(y, F.lit(0)), F.lit(int(n) - 1)).cast("long")
    return x, y


def assign_tiles(labels: DataFrame, z: int, lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    x, y = tile_xy(F.col(lat_col), F.col(lon_col), z)
    return labels.withColumn("tile_z", F.lit(z)).withColumn("tile_x", x).withColumn("tile_y", y)


def tiles_with_order(labels: DataFrame, z: int, rank_col: str = "rank") -> DataFrame:
    """Labels + (z,x,y) + position within the tile by importance.

    The window partitions by tile — bounded fan-in per task (a tile holds
    a bounded number of labels after kNN dedup), so this scales, unlike a
    global-order window.
    """
    tiled = assign_tiles(labels, z)
    w = Window.partitionBy("tile_z", "tile_x", "tile_y").orderBy(F.col(rank_col).asc())
    return tiled.withColumn("tile_pos", F.row_number().over(w) - 1)
