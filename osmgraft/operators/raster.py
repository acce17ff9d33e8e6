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
from pyspark.sql.window import Window

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


def idw_grid(
    points: DataFrame,
    z: int,
    px: int = 256,
    radius: int = 2,
    value_col: str = "value",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Inverse-distance-weighted interpolation of point values onto the
    Web-Mercator pixel grid — the "surface" half of the vector->raster
    bridge (``rasterize`` is the binning half).

    Scatter formulation: each point explodes to its ``(2*radius+1)^2``
    neighboring pixel keys — a CONSTANT fan-out, never a point-by-grid
    cross join — then ONE shuffle on the pixel key finishes
    ``sum(w*v)/sum(w)`` with map-side partial aggregation. Distances are
    pixel-center to pixel-center with the point snapped to its own pixel
    center; the weight is the inverse-square ``1/(d^2 + 0.5)`` (the +0.5
    keeps the point's own pixel finite). ``d^2`` is an exact small
    integer, so the per-row weight is the same IEEE double in any engine
    and the whole operator replays as closed-form ANSI SQL.

    Pixels with no point within ``radius`` (Euclidean, in pixel units)
    are absent: IDW support is bounded, which keeps the shuffle
    proportional to TOUCHED pixels rather than the full 4^z grid at
    planet scale. Skew: a megacity pixel neighborhood aggregates at most
    ``(2*radius+1)^2`` partial rows per map task regardless of how many
    points share a cell, because the partial agg collapses them before
    the exchange.
    """
    n = (1 << z) * px
    gx, gy = _global_pixel(F.col(lat_col), F.col(lon_col), z, px)
    src = points.select(
        F.col(value_col).cast("double").alias("_v"),
        gx.alias("_gx"),
        gy.alias("_gy"),
    )
    off = F.sequence(F.lit(-radius), F.lit(radius))
    d2 = (F.col("_dx") * F.col("_dx") + F.col("_dy") * F.col("_dy")).cast("double")
    fan = (
        src.withColumn("_dx", F.explode(off))
        .withColumn("_dy", F.explode(off))
        .where(d2 <= float(radius * radius))
        .withColumn("_tx", F.col("_gx") + F.col("_dx"))
        .withColumn("_ty", F.col("_gy") + F.col("_dy"))
        .where(
            (F.col("_tx") >= 0)
            & (F.col("_tx") < n)
            & (F.col("_ty") >= 0)
            & (F.col("_ty") < n)
        )
        .withColumn("_w", F.lit(1.0) / (d2 + 0.5))
    )
    return (
        fan.groupBy("_tx", "_ty")
        .agg(
            (F.sum(F.col("_w") * F.col("_v")) / F.sum("_w")).alias("value"),
            F.count("*").alias("n_src"),
        )
        .select(
            F.lit(z).alias("tile_z"),
            (F.col("_tx") / px).cast("long").alias("tile_x"),
            (F.col("_ty") / px).cast("long").alias("tile_y"),
            (F.col("_tx") % px).cast("long").alias("px_x"),
            (F.col("_ty") % px).cast("long").alias("px_y"),
            "value",
            "n_src",
        )
    )


def smooth_box(
    raster: DataFrame, px: int = 256, radius: int = 1, passes: str = "separable"
) -> DataFrame:
    """Box-filter smoothing of a sparse raster (mean over the
    ``(2r+1)^2`` neighborhood, absent pixels contribute 0) — the
    standard KDE-ish post-pass over a ``rasterize`` density before
    contouring or tiling.

    ``passes='separable'`` exploits box-filter separability: one
    horizontal 1-D scatter (fan-out ``2r+1``) + groupBy, then the same
    vertically — total shuffle volume ``~2(2r+1)|cells|`` instead of the
    naive 2-D scatter's ``(2r+1)^2|cells|``; at r=3 that is 7+7 vs 49
    rows per cell, and the win grows quadratically with radius.
    ``passes='direct'`` keeps the one-shuffle 2-D scatter (can win only
    at r=1 where a second exchange dominates the saved fan-out).

    The mean divides by the FULL window size ``(2r+1)^2``
    (zero-padding semantics, standard for density surfaces) — exactly
    what makes the two 1-D sums compose (sum_2d = sum_y(sum_x)); the
    constant division happens once at the end, so both paths agree per
    pixel up to float summation order. Scattered contributions falling
    outside the global z-grid are dropped (edge clip, no wrap).

    Input/output schema: the ``rasterize`` grid ``(tile_z, tile_x,
    tile_y, px_x, px_y, value)`` at tile width ``px``.
    """
    if passes not in ("separable", "direct"):
        raise ValueError(f"unknown passes mode '{passes}'")
    k = 2 * radius + 1
    off = F.sequence(F.lit(-radius), F.lit(radius))
    n = F.pow(F.lit(2.0), F.col("tile_z")) * float(px)

    def in_grid(df: DataFrame) -> DataFrame:
        return df.where(
            (F.col("_gx") >= 0)
            & (F.col("_gx") < n)
            & (F.col("_gy") >= 0)
            & (F.col("_gy") < n)
        )

    def scatter_1d(df: DataFrame, axis: str) -> DataFrame:
        gx = F.col("_gx") + (F.col("_d") if axis == "x" else F.lit(0))
        gy = F.col("_gy") + (F.col("_d") if axis == "y" else F.lit(0))
        fanned = df.withColumn("_d", F.explode(off)).select(
            "tile_z", gx.alias("_gx"), gy.alias("_gy"), "_v"
        )
        return (
            in_grid(fanned)
            .groupBy("tile_z", "_gx", "_gy")
            .agg(F.sum("_v").alias("_v"))
        )

    cells = raster.select(
        "tile_z",
        (F.col("tile_x") * px + F.col("px_x")).alias("_gx"),
        (F.col("tile_y") * px + F.col("px_y")).alias("_gy"),
        F.col("value").cast("double").alias("_v"),
    )
    if passes == "separable":
        out = scatter_1d(scatter_1d(cells, "x"), "y")
    else:
        fanned = (
            cells.withColumn("_dx", F.explode(off))
            .withColumn("_dy", F.explode(off))
            .select(
                "tile_z",
                (F.col("_gx") + F.col("_dx")).alias("_gx"),
                (F.col("_gy") + F.col("_dy")).alias("_gy"),
                "_v",
            )
        )
        out = (
            in_grid(fanned)
            .groupBy("tile_z", "_gx", "_gy")
            .agg(F.sum("_v").alias("_v"))
        )
    return out.select(
        "tile_z",
        (F.col("_gx") / px).cast("long").alias("tile_x"),
        (F.col("_gy") / px).cast("long").alias("tile_y"),
        (F.col("_gx") % px).cast("long").alias("px_x"),
        (F.col("_gy") % px).cast("long").alias("px_y"),
        (F.col("_v") / float(k * k)).alias("value"),
    )


def contour_segments(
    raster: DataFrame, px: int = 256, threshold: float = 0.5
) -> DataFrame:
    """Marching-squares contour extraction from a sparse raster: the
    iso-line of ``value = threshold``, one row per line segment in
    GLOBAL pixel coordinates — the classic raster -> vector bridge for
    density surfaces (rasterize -> smooth_box -> contour is the heatmap
    isopleth pipeline).

    Mechanics: every touched pixel scatters to the 4 2x2 blocks it
    corners (constant fan-out, same family as idw_grid/smooth_box); ONE
    shuffle on the block anchor pivots the 4 corner values (absent
    corners = 0 — virtual zero padding outside the data and the grid,
    so contours CLOSE around data at the boundary); the 16-case lookup
    plus edge interpolation then run pure-Catalyst per block, and the
    saddle cases (5, 10) resolve on the center average — all of it
    branch-only arithmetic that replays in ANSI SQL. Endpoints
    interpolate linearly on the crossing edges: a referenced edge always
    straddles the threshold, so the denominator is never 0.

    Output: (case_id, x0, y0, x1, y1) with coordinates in pixel units
    on the zoom grid (block anchor + edge fraction); convert to lat/lon
    with the same inverse mercator as ``vectorize`` when needed.
    """
    cells = raster.select(
        (F.col("tile_x") * px + F.col("px_x")).alias("_gx"),
        (F.col("tile_y") * px + F.col("px_y")).alias("_gy"),
        F.col("value").cast("double").alias("_v"),
    )
    # scatter: pixel (gx, gy) is corner (dx, dy) of block (gx-dx, gy-dy)
    fan = (
        cells.withColumn("_dx", F.explode(F.array(F.lit(0), F.lit(1))))
        .withColumn("_dy", F.explode(F.array(F.lit(0), F.lit(1))))
        .select(
            (F.col("_gx") - F.col("_dx")).alias("_bx"),
            (F.col("_gy") - F.col("_dy")).alias("_by"),
            "_dx",
            "_dy",
            "_v",
        )
    )
    corner = lambda dx, dy: F.coalesce(  # noqa: E731
        F.sum(F.when((F.col("_dx") == dx) & (F.col("_dy") == dy), F.col("_v"))),
        F.lit(0.0),
    )
    blocks = fan.groupBy("_bx", "_by").agg(
        corner(0, 0).alias("_tl"),
        corner(1, 0).alias("_tr"),
        corner(0, 1).alias("_bl"),
        corner(1, 1).alias("_br"),
    )
    t = float(threshold)
    hi = lambda c: F.when(F.col(c) > t, 1).otherwise(0)  # noqa: E731
    blocks = blocks.withColumn(
        "_c", (hi("_tl") * 8 + hi("_tr") * 4 + hi("_br") * 2 + hi("_bl")).cast("int")
    ).where(~F.col("_c").isin(0, 15))
    bx, by = F.col("_bx").cast("double"), F.col("_by").cast("double")
    frac = lambda a, b: (F.lit(t) - F.col(a)) / (F.col(b) - F.col(a))  # noqa: E731
    pts = {
        "t": (bx + frac("_tl", "_tr"), by),
        "r": (bx + 1.0, by + frac("_tr", "_br")),
        "b": (bx + frac("_bl", "_br"), by + 1.0),
        "l": (bx, by + frac("_tl", "_bl")),
    }

    def seg(a: str, b: str) -> Column:
        (xa, ya), (xb, yb) = pts[a], pts[b]
        return F.struct(
            xa.alias("x0"), ya.alias("y0"), xb.alias("x1"), yb.alias("y1")
        )

    center_hi = (F.col("_tl") + F.col("_tr") + F.col("_bl") + F.col("_br")) / 4.0 > t
    c = F.col("_c")
    segs = (
        F.when(c == 1, F.array(seg("l", "b")))
        .when(c == 2, F.array(seg("b", "r")))
        .when(c == 3, F.array(seg("l", "r")))
        .when(c == 4, F.array(seg("t", "r")))
        .when((c == 5) & center_hi, F.array(seg("t", "l"), seg("b", "r")))
        .when(c == 5, F.array(seg("t", "r"), seg("l", "b")))
        .when(c == 6, F.array(seg("t", "b")))
        .when(c == 7, F.array(seg("l", "t")))
        .when(c == 8, F.array(seg("t", "l")))
        .when(c == 9, F.array(seg("t", "b")))
        .when((c == 10) & center_hi, F.array(seg("t", "r"), seg("l", "b")))
        .when(c == 10, F.array(seg("t", "l"), seg("b", "r")))
        .when(c == 11, F.array(seg("t", "r")))
        .when(c == 12, F.array(seg("l", "r")))
        .when(c == 13, F.array(seg("b", "r")))
        .when(c == 14, F.array(seg("l", "b")))
    )
    out = blocks.select("_c", F.explode(segs).alias("_s"))
    return out.select(
        F.col("_c").alias("case_id"),
        F.col("_s.x0").alias("x0"),
        F.col("_s.y0").alias("y0"),
        F.col("_s.x1").alias("x1"),
        F.col("_s.y1").alias("y1"),
    )


def vectorize_runs(raster: DataFrame, px: int = 256) -> DataFrame:
    """Raster -> vector with maximal horizontal run-length merging:
    consecutive equal-valued pixels in a global pixel row collapse into
    ONE rectangle (classic gaps-and-islands: ``gx - row_number()`` is
    constant along a run). Compared with per-pixel ``vectorize`` this is
    the compaction pass a tile sink wants — a uniform ocean row becomes
    one rectangle instead of 2^z.

    Plan shape: one window + one groupBy, both clustered on the same
    ``(tile_z, gy, value)`` prefix, so Catalyst plans a SINGLE exchange
    (the groupBy reuses the window's hash partitioning — its key set is a
    superset). Runs may span tile_x boundaries on purpose; output is in
    the same (poly_id, value, bounds) vocabulary as ``vectorize``.
    """
    n = F.pow(F.lit(2.0), F.col("tile_z")) * float(px)
    gx = (F.col("tile_x") * px + F.col("px_x")).alias("_gx")
    gy = (F.col("tile_y") * px + F.col("px_y")).alias("_gy")
    w = Window.partitionBy("tile_z", "_gy", "value").orderBy("_gx")
    runs = raster.select("tile_z", "value", gx, gy).withColumn(
        "_run", F.col("_gx") - F.row_number().over(w)
    )
    grp = runs.groupBy("tile_z", "_gy", "value", "_run").agg(
        F.min("_gx").alias("_gx0"),
        F.max("_gx").alias("_gx1"),
        F.count("*").alias("run_len"),
    )

    def inv_lat(gyc: Column) -> Column:
        a = math.pi - (2.0 * math.pi) * gyc / n
        return F.degrees(F.atan((F.exp(a) - F.exp(-a)) / 2.0))

    def inv_lon(gxc: Column) -> Column:
        return gxc / n * 360.0 - 180.0

    return grp.select(
        (F.col("_gx0") * F.lit(1 << 32) + F.col("_gy")).alias("poly_id"),
        "tile_z",
        "value",
        "run_len",
        inv_lon(F.col("_gx0")).alias("west"),
        inv_lon(F.col("_gx1") + 1).alias("east"),
        inv_lat(F.col("_gy")).alias("north"),
        inv_lat(F.col("_gy") + 1).alias("south"),
    )
