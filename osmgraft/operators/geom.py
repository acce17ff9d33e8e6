"""Geodesic geometry kernels for way/polyline processing.

The reference importer consumes way geometries (segment member walks,
`osminputhelper.cpp:246-253`) but never measures or simplifies them; a
tiling engine needs both — length for importance/filtering heuristics
and simplification for rendering geometry at coarse zooms, where
shipping every vertex of a 10^5-point coastline into a z6 tile is pure
waste.

- :func:`polyline_length_m` is a pure-Catalyst array fold (haversine per
  consecutive vertex pair, summed left-to-right) — no Python, no
  explode, no shuffle: a 10^9-way table pays one narrow projection.
- :func:`simplify_polyline` is Douglas-Peucker over the array columns as
  an Arrow-batched ``mapInPandas`` numpy kernel (the algorithm is an
  inherently sequential recursion per geometry; per-geometry cost is
  O(n log n) expected, and geometries stay row-local so the operator is
  map-only — the right shape at any scale).

Tolerance for simplification is measured in DEGREES of perpendicular
offset on the equirectangular plane (the standard slippy-tile rendering
simplification; for meters-accurate simplification scale the tolerance
by cos(lat) upstream).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmgraft.operators.knn import haversine_m


def polyline_length_m(lats: Column, lons: Column) -> Column:
    """Great-circle length (meters) of the polyline given as parallel
    lat/lon arrays: a left-to-right ``aggregate`` over the n-1 segments,
    each segment the engine's standard haversine. Arrays shorter than 2
    points have length 0.0. Whole-stage codegen; SQL-replayable (the
    oracle unnests segments and sums in index order — float order
    differences are below the comparator's 9-significant-digit
    normalization)."""
    n = F.size(lats)
    idx = F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0)))
    seg = lambda i: haversine_m(  # noqa: E731
        F.element_at(lats, i + 1),
        F.element_at(lons, i + 1),
        F.element_at(lats, i + 2),
        F.element_at(lons, i + 2),
    )
    total = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + seg(i))
    return F.when(n < 2, F.lit(0.0)).otherwise(total)


def polyline_length_oracle_sql(ways_cte: str) -> str:
    """DuckDB replica over ``ways_cte`` (columns ``way_id, lats, lons``):
    per-segment haversine (identical formula to
    :func:`osmgraft.operators.knn.haversine_m`) summed in segment
    order."""
    hav = (
        "2*6371008.8*asin(sqrt(pow(sin(radians(la2-la1)/2),2) + "
        "cos(radians(la1))*cos(radians(la2))*pow(sin(radians(lo2-lo1)/2),2)))"
    )
    return (
        f"with gl_w as ({ways_cte}), "
        "gl_seg as (select way_id, lats[i] as la1, lons[i] as lo1, "
        "lats[i+1] as la2, lons[i+1] as lo2 "
        "from gl_w, unnest(range(1, greatest(len(lats), 1))) as t(i)), "
        f"gl_len as (select way_id, sum({hav}) as length_m from gl_seg "
        "group by way_id) "
        "select w.way_id, coalesce(l.length_m, 0.0) as length_m "
        "from gl_w w left join gl_len l using (way_id)"
    )


def ring_area_m2(lats: Column, lons: Column) -> Column:
    """Spherical polygon area (m^2) of the ring given as parallel lat/lon
    arrays (open rings fine — the fold wraps the last->first edge).
    Chamberlain & Duquette's spherical shoelace (JPL publication 07-3,
    public; the formula turf.js ships):

        area = |sum over edges of (lon2-lon1) * (2 + sin(lat1) + sin(lat2))|
               * R^2 / 2   (radians)

    Edge longitude deltas are wrapped to (-180, 180] before the term, so
    small rings CROSSING the antimeridian (Fiji-scale landuse at lon
    +-180) compute correctly; without the wrap their delta-lon would read
    ~-360 and the area would be off by orders of magnitude.

    Pure Catalyst fold like :func:`polyline_length_m` — no Python, no
    shuffle. Degenerate rings (< 3 points) return 0.0. Accurate to ~1e-6
    relative for polygons small against the sphere (admin/landuse
    scale); not for hemisphere-scale rings (any ring with a true edge
    span of exactly 180 degrees is ambiguous under the wrap)."""
    n = F.size(lats)
    r = 6371008.8

    def vertex(arr: Column, i: Column) -> Column:
        # wrap: index i modulo n, 1-based element_at
        return F.element_at(arr, (F.pmod(i, n) + 1).cast("int"))

    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    # antimeridian wrap: delta-lon normalized to (-180, 180]
    dlon = lambda i: (  # noqa: E731
        F.pmod(vertex(lons, i + 1) - vertex(lons, i) + F.lit(540.0), F.lit(360.0))
        - F.lit(180.0)
    )
    term = lambda i: (  # noqa: E731
        F.radians(dlon(i))
        * (
            F.lit(2.0)
            + F.sin(F.radians(vertex(lats, i)))
            + F.sin(F.radians(vertex(lats, i + 1)))
        )
    )
    total = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + term(i))
    return F.when(n < 3, F.lit(0.0)).otherwise(F.abs(total) * F.lit(r * r / 2.0))


def ring_centroid(lats: Column, lons: Column) -> Column:
    """Area-weighted (shoelace) centroid of the ring given as parallel
    lat/lon arrays, returned as ``struct(lat, lon)`` — the engine
    extension next to the reference's plain dup-counting vertex average
    (A2, `osmpoi.cpp`): the shoelace centroid is what label placement
    wants for concave admin polygons (a C-shaped bay's vertex average
    sits in the water).

    Planar on (lon, lat) — adequate at admin/landuse scale away from
    the antimeridian and poles, same envelope as the reference's own
    planar centroid. Open rings fine (the fold wraps last->first).
    Degenerate rings (< 3 points, or zero signed area — collinear)
    fall back to the plain vertex average; the zero test is exact
    (``== 0.0``) so the branch is engine-deterministic.

    Pure Catalyst folds, no Python, no shuffle; replays in ANSI SQL
    (:func:`ring_centroid_oracle_sql`).
    """
    n = F.size(lats)

    def vertex(arr: Column, i: Column) -> Column:
        return F.element_at(arr, (F.pmod(i, n) + 1).cast("int"))

    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    x = lambda i: vertex(lons, i)  # noqa: E731
    y = lambda i: vertex(lats, i)  # noqa: E731
    cross = lambda i: x(i) * y(i + 1) - x(i + 1) * y(i)  # noqa: E731
    a2 = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + cross(i))
    sx = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + (x(i) + x(i + 1)) * cross(i))
    sy = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + (y(i) + y(i + 1)) * cross(i))
    mean_lat = F.aggregate(lats, F.lit(0.0), lambda acc, v: acc + v) / n
    mean_lon = F.aggregate(lons, F.lit(0.0), lambda acc, v: acc + v) / n
    degenerate = (n < 3) | (a2 == 0.0)
    clat = F.when(degenerate, mean_lat).otherwise(sy / (3.0 * a2))
    clon = F.when(degenerate, mean_lon).otherwise(sx / (3.0 * a2))
    return F.struct(clat.alias("lat"), clon.alias("lon"))


def polyline_point_at(lats: Column, lons: Column, frac: float = 0.5) -> Column:
    """Point at ``frac`` of the geodesic length along the polyline (lat/
    lon parallel arrays), returned as ``struct(lat, lon)`` — the street-
    label anchor op (``frac=0.5`` = the way midpoint, where a road label
    sits; the reference anchors labels at node/centroid positions only).

    Two pure-Catalyst folds, no Python, no shuffle: one for the total
    haversine length, one that walks segments carrying the CUMULATIVE
    length (not a remaining-distance subtraction — the running sum is
    the same left-associated IEEE addition chain the SQL replica's
    ordered window sum produces, so the segment choice and the linear
    interpolation are bit-identical across engines by construction).
    Zero-length segments take the segment's start vertex instead of
    dividing by zero; fp undershoot at ``frac=1`` falls through to the
    last vertex; single-point lines return that point.
    """
    n = F.size(lats)

    def v(arr: Column, i) -> Column:
        return F.element_at(arr, F.lit(i + 1) if isinstance(i, int) else (i + 1).cast("int"))

    seg = lambda i: haversine_m(  # noqa: E731
        v(lats, i), v(lons, i), v(lats, i + 1), v(lons, i + 1)
    )
    idx = F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0)))
    total = F.when(
        n < 2, F.lit(0.0)
    ).otherwise(F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + seg(i)))
    target = total * F.lit(float(frac))

    def walk(acc: Column, i: Column) -> Column:
        s = seg(i)
        new_cum = acc["cum"] + s
        t = (target - acc["cum"]) / s
        hit_lat = F.when(s > 0.0, v(lats, i) + (v(lats, i + 1) - v(lats, i)) * t).otherwise(
            v(lats, i)
        )
        hit_lon = F.when(s > 0.0, v(lons, i) + (v(lons, i + 1) - v(lons, i)) * t).otherwise(
            v(lons, i)
        )
        hit = F.struct(
            new_cum.alias("cum"),
            hit_lat.alias("lat"),
            hit_lon.alias("lon"),
            F.lit(True).alias("done"),
        )
        step = F.struct(
            new_cum.alias("cum"),
            acc["lat"].alias("lat"),
            acc["lon"].alias("lon"),
            F.lit(False).alias("done"),
        )
        return F.when(acc["done"], acc).when(new_cum >= target, hit).otherwise(step)

    init = F.struct(
        F.lit(0.0).alias("cum"),
        F.lit(None).cast("double").alias("lat"),
        F.lit(None).cast("double").alias("lon"),
        F.lit(False).alias("done"),
    )
    walked = F.aggregate(idx, init, walk)
    last = F.element_at(lats, -1), F.element_at(lons, -1)
    out_lat = F.when(n < 2, F.element_at(lats, 1)).when(
        walked["done"], walked["lat"]
    ).otherwise(last[0])
    out_lon = F.when(n < 2, F.element_at(lons, 1)).when(
        walked["done"], walked["lon"]
    ).otherwise(last[1])
    return F.struct(out_lat.alias("lat"), out_lon.alias("lon"))


def polyline_point_at_oracle_sql(ways_cte: str, frac: float = 0.5) -> str:
    """DuckDB replica over ``ways_cte`` (columns ``way_id, lats, lons``):
    ordered cumulative segment sums reproduce the fold's addition chain;
    the first segment whose cumulative length reaches ``frac * total``
    interpolates with the identical expression."""
    hav = (
        "2*6371008.8*asin(sqrt(pow(sin(radians(la2-la1)/2),2) + "
        "cos(radians(la1))*cos(radians(la2))*pow(sin(radians(lo2-lo1)/2),2)))"
    )
    return (
        f"with pw_w as (select *, len(lats) as n from ({ways_cte})), "
        "pw_seg as (select way_id, i, lats[i] as la1, lons[i] as lo1, "
        "lats[i+1] as la2, lons[i+1] as lo2 "
        "from pw_w, unnest(range(1, greatest(len(lats), 1))) as t(i)), "
        f"pw_len as (select *, {hav} as s from pw_seg), "
        "pw_c0 as (select *, sum(s) over (partition by way_id order by i "
        "rows unbounded preceding) as cum from pw_len), "
        # cumprev must be the SAME left-associated chain as the fold's
        # accumulator, i.e. the previous row's cum — NOT cum - s, which
        # is a different IEEE rounding sequence
        "pw_cum as (select *, coalesce(lag(cum) over (partition by way_id "
        "order by i), 0.0) as cumprev from pw_c0), "
        f"pw_tgt as (select way_id, max(cum) * {float(frac)!r} as target "
        "from pw_cum group by way_id), "
        "pw_hit as (select c.way_id, c.i, c.s, c.cum, c.cumprev, "
        "c.la1, c.lo1, c.la2, c.lo2, t.target, "
        "row_number() over (partition by c.way_id order by c.i) as rk "
        "from pw_cum c join pw_tgt t using (way_id) where c.cum >= t.target), "
        "pw_pt as (select way_id, "
        "case when s > 0.0 then la1 + (la2 - la1) * ((target - cumprev) / s) else la1 end as plat, "
        "case when s > 0.0 then lo1 + (lo2 - lo1) * ((target - cumprev) / s) else lo1 end as plon "
        "from pw_hit where rk = 1) "
        "select w.way_id, "
        "case when w.n < 2 then w.lats[1] "
        "when p.plat is not null then p.plat else w.lats[w.n] end as plat, "
        "case when w.n < 2 then w.lons[1] "
        "when p.plon is not null then p.plon else w.lons[w.n] end as plon "
        "from pw_w w left join pw_pt p using (way_id)"
    )


def ring_centroid_oracle_sql(rings_cte: str) -> str:
    """DuckDB replica over ``rings_cte`` (columns ``ring_id, lats,
    lons``): identical wrap-around cross terms; degenerate rings fall
    back to the vertex average exactly like :func:`ring_centroid`."""
    xi = "lons[1 + (i % n)]"
    xi1 = "lons[1 + ((i + 1) % n)]"
    yi = "lats[1 + (i % n)]"
    yi1 = "lats[1 + ((i + 1) % n)]"
    cross = f"({xi}*{yi1} - {xi1}*{yi})"
    return (
        f"with gc_r as (select *, len(lats) as n from ({rings_cte})), "
        "gc_e as (select ring_id, unnest(range(0, greatest(n, 1))) as i from gc_r), "
        "gc_t as (select e.ring_id, "
        f"sum({cross}) as a2, "
        f"sum(({xi} + {xi1}) * {cross}) as sx, "
        f"sum(({yi} + {yi1}) * {cross}) as sy "
        "from gc_e e join gc_r r using (ring_id) group by e.ring_id), "
        "gc_m as (select ring_id, list_sum(lats)/n as mlat, list_sum(lons)/n as mlon "
        "from gc_r) "
        "select r.ring_id, "
        "case when r.n < 3 or t.a2 = 0.0 then m.mlat else t.sy/(3.0*t.a2) end as clat, "
        "case when r.n < 3 or t.a2 = 0.0 then m.mlon else t.sx/(3.0*t.a2) end as clon "
        "from gc_r r left join gc_t t using (ring_id) join gc_m m using (ring_id)"
    )


def ring_area_oracle_sql(rings_cte: str) -> str:
    """DuckDB replica over ``rings_cte`` (columns ``ring_id, lats,
    lons``): identical wrap-around edge terms summed in index order."""
    term = (
        "radians(((lons[1 + ((i + 1) % n)] - lons[1 + (i % n)] + 540.0) % 360.0) - 180.0) * "
        "(2.0 + sin(radians(lats[1 + (i % n)])) + sin(radians(lats[1 + ((i + 1) % n)])))"
    )
    return (
        f"with ga_r as (select *, len(lats) as n from ({rings_cte})), "
        "ga_e as (select ring_id, "
        "unnest(range(0, greatest(n, 1))) as i from ga_r), "
        "ga_t as (select e.ring_id, "
        f"sum({term}) as s "
        "from ga_e e join ga_r r using (ring_id) group by e.ring_id), "
        "ga_a as (select ring_id, abs(s) * 6371008.8 * 6371008.8 / 2.0 as area_m2 "
        "from ga_t) "
        "select r.ring_id, case when r.n < 3 then 0.0 else a.area_m2 end as area_m2 "
        "from ga_r r left join ga_a a using (ring_id)"
    )


def _dp_keep(lats: np.ndarray, lons: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep-mask, iterative (explicit stack — a 10^5-point
    degenerate chain must not hit Python's recursion limit)."""
    n = len(lats)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay = lons[a], lats[a]
        dx, dy = lons[b] - ax, lats[b] - ay
        px = lons[a + 1 : b] - ax
        py = lats[a + 1 : b] - ay
        norm2 = dx * dx + dy * dy
        if norm2 == 0.0:  # closed/degenerate chord: plain distance to a
            d2 = px * px + py * py
        else:  # perpendicular distance to the segment's infinite line
            cross = px * dy - py * dx
            d2 = cross * cross / norm2
        k = int(np.argmax(d2))
        if d2[k] > tol * tol:
            m = a + 1 + k
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def simplify_polyline(
    ways: DataFrame,
    tolerance_deg: float,
    lats_col: str = "lats",
    lons_col: str = "lons",
) -> DataFrame:
    """Douglas-Peucker simplification of every polyline: vertices farther
    than ``tolerance_deg`` (perpendicular, equirectangular) from the
    kept chord survive; endpoints always survive. Output = input columns
    with the two array columns REPLACED by their simplified versions plus
    ``n_points_in`` / ``n_points_out``. Map-only (no shuffle); geometries
    never leave their row."""
    if tolerance_deg < 0:
        raise ValueError("tolerance_deg must be >= 0")
    import pandas as pd

    schema_in = ways.schema
    out_fields = [f for f in schema_in.fields]
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
        + ", n_points_in int, n_points_out int"
    )

    cols = [f.name for f in schema_in.fields]

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            la_out, lo_out, nin, nout = [], [], [], []
            for la, lo in zip(pdf[lats_col], pdf[lons_col]):
                la = np.asarray(la, dtype=np.float64)
                lo = np.asarray(lo, dtype=np.float64)
                if len(la) < 3:
                    keep = np.ones(len(la), dtype=bool)
                else:
                    keep = _dp_keep(la, lo, tolerance_deg)
                la_out.append(la[keep].tolist())
                lo_out.append(lo[keep].tolist())
                nin.append(len(la))
                nout.append(int(keep.sum()))
            out = pdf.copy()
            out[lats_col] = la_out
            out[lons_col] = lo_out
            out["n_points_in"] = np.array(nin, dtype=np.int32)
            out["n_points_out"] = np.array(nout, dtype=np.int32)
            yield out[cols + ["n_points_in", "n_points_out"]]

    return ways.mapInPandas(fn, schema)
