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


def tile_pyramid(
    labels: DataFrame,
    z_max: int,
    z_min: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    rank_col: str | None = None,
    single_scan: bool = True,
    persist_tracker: list | None = None,
) -> DataFrame:
    """Multi-resolution tile rollup: per-tile label count (and, with
    ``rank_col``, best importance rank) at EVERY zoom in
    ``[z_min, z_max]``, in one frame ``(tile_z, tile_x, tile_y,
    n_labels[, best_rank])``.

    The scale property is that the INPUT is scanned exactly once, for
    the z_max base aggregation; every coarser level is derived from the
    previous level's (already aggregated, exponentially smaller) output
    via the parent relation ``(x, y) -> (x >> 1, y >> 1)``, which is
    EXACT for slippy tiles: tile_x at z-1 is
    ``floor(floor(t * 2^z) / 2) = floor(t * 2^(z-1))``, and the
    lon=180 / polar clamps map edge tiles to edge tiles. So a
    z12->z7 pyramid over 10^12 rows costs one z12 shuffle plus five
    shuffles whose inputs are the z12..z8 TILE tables (<= 4^z rows
    each), not five more scans of the corpus — the classic OLAP rollup
    reuse. count rolls up by sum, min-rank by min; both aggregations
    are algebraic so map-side partial aggregation applies at every
    level.

    ``single_scan`` makes the reuse REAL, not aspirational: Catalyst
    does not fire ReusedExchange across the union branches here (each
    branch's plan differs past the base agg), so without caching the
    union would recompute the base aggregation — i.e. rescan the corpus
    — once per level. Each level frame is therefore lazily persisted
    (MEMORY_AND_DISK); every persisted frame is a TILE table (at most
    one row per occupied tile, <= 4^z), never the input, so the cache
    footprint is bounded by the z_max tile table regardless of corpus
    size. The first action computes each level once; pass
    ``single_scan=False`` to opt out (e.g. when the caller persists the
    input itself). The persisted level frames live until the session ends
    unless the caller passes ``persist_tracker`` (a list) — every
    persisted frame is appended to it so the caller can ``unpersist()``
    after consuming the pyramid, instead of nuking the whole session
    cache with ``spark.catalog.clearCache()``."""
    if z_min < 0 or z_max < z_min:
        raise ValueError("need 0 <= z_min <= z_max")
    aggs = [F.count("*").alias("n_labels")]
    roll_sum = [F.sum("n_labels").alias("n_labels")]
    if rank_col is not None:
        aggs.append(F.min(rank_col).alias("best_rank"))
        roll_sum.append(F.min("best_rank").alias("best_rank"))
    level = (
        assign_tiles(labels, z_max, lat_col, lon_col)
        .groupBy("tile_z", "tile_x", "tile_y")
        .agg(*aggs)
    )
    if single_scan and z_max > z_min:
        level = level.persist()
        if persist_tracker is not None:
            persist_tracker.append(level)
    levels = [level]
    for z in range(z_max - 1, z_min - 1, -1):
        level = (
            level.select(
                F.lit(z).alias("tile_z"),
                F.shiftright("tile_x", 1).alias("tile_x"),
                F.shiftright("tile_y", 1).alias("tile_y"),
                *(["n_labels", "best_rank"] if rank_col else ["n_labels"]),
            )
            .groupBy("tile_z", "tile_x", "tile_y")
            .agg(*roll_sum)
        )
        if single_scan and z > z_min:
            level = level.persist()
            if persist_tracker is not None:
                persist_tracker.append(level)
        levels.append(level)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
