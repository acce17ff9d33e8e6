"""Trajectory stay-point detection: the spatial sibling of gap-based
sessionization (operators/sessions.py).

A stay point is a maximal run of a mover's consecutive fixes in which
each fix stays within ``jump_m`` of the PREVIOUS fix, dwelt for at
least ``min_duration_s`` and at least ``min_pts`` fixes; it reduces to
one row (centroid, dwell interval, fix count). This is the standard
GPS-trace summarization pass of a movement-data training pipeline —
raw pings are 95%+ redundant; the stay/move decomposition is what a
model trains on.

Semantics note: the classic Li/Zheng (GeoLife) formulation anchors the
distance test at the run's FIRST fix, which makes the run boundary a
function of an iteratively-updated anchor — inherently sequential and
not expressible as a fixed window. The consecutive-pair variant
implemented here is the standard streaming simplification (break when
the step distance exceeds ``jump_m``): it admits slow drift beyond
``jump_m`` across a long dwell, which for label/POI aggregation is the
behavior you usually want (a mall visit drifts), and it keeps the whole
operator ONE window + ONE refined-key aggregate.

Execution shape (same family as sessionize/scd2_intervals — the shape
that survives 100 TB): ONE hash shuffle on the mover key; the lag step
distance, the running break-sum that numbers runs, and the per-run
aggregate all share that partitioning (the groupBy key ``(user, run)``
refines the window key), so Catalyst plans a single Exchange. The step
distance is the engine's standard haversine
(:func:`osmgraft.operators.knn.haversine_m`), pure Catalyst, and the
break predicate evaluates on it directly — bit-identical replay in any
engine with IEEE doubles. Ordering ties break on ``order_tiebreak`` so
run numbering is deterministic under retries and across engines.

Skew: one mover's full history sorts in one task — the semantic
minimum for ordered segmentation; see sessions.py's note on time-range
pre-splitting for a pathological device.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from osmgraft.operators.knn import haversine_m


def stay_points(
    fixes: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_s",
    lat_col: str = "lat",
    lon_col: str = "lon",
    order_tiebreak: str | None = None,
    jump_m: float = 200.0,
    min_duration_s: int = 300,
    min_pts: int = 2,
) -> DataFrame:
    """Stay points of per-mover fix streams.

    ``fixes``: (user, ts_s NUMERIC epoch seconds, lat, lon[, tiebreak]).
    Output: ``(user, stay_seq, n_fixes, t_start, t_end, dwell_s,
    lat, lon)`` with the centroid as plain fix-average (round it at the
    query level when comparing across engines — summation order is not
    fixed).
    """
    order = [F.col(ts_col).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    step = haversine_m(
        F.lag(lat_col).over(w),
        F.lag(lon_col).over(w),
        F.col(lat_col),
        F.col(lon_col),
    )
    brk = F.when(F.lag(lat_col).over(w).isNull() | (step > jump_m), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = fixes.withColumn("stay_seq", F.sum(brk).over(run))
    g = numbered.groupBy(F.col(user_col), F.col("stay_seq")).agg(
        F.count("*").alias("n_fixes"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        (F.max(ts_col) - F.min(ts_col)).cast("long").alias("dwell_s"),
        F.avg(lat_col).alias("lat"),
        F.avg(lon_col).alias("lon"),
    )
    return g.where(
        (F.col("dwell_s") >= min_duration_s) & (F.col("n_fixes") >= min_pts)
    )


def radius_of_gyration(
    fixes: DataFrame,
    user_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-mover radius of gyration — sqrt of the mean squared haversine
    distance of fixes from the mover's centroid (plain lat/lon average;
    adequate away from the poles/antimeridian, same caveat as any
    lat/lon centroid) — THE standard scale-of-movement summary of
    mobility datasets (Gonzalez et al., "Understanding individual human
    mobility patterns").

    ONE hash shuffle: the centroid is an unordered analytic window over
    the mover partition, and the squared-distance reduction is a
    same-key aggregate riding that partitioning. Output:
    ``(user, n_fixes, rog_m)``.
    """
    w = Window.partitionBy(user_col)
    clat = F.avg(lat_col).over(w)
    clon = F.avg(lon_col).over(w)
    d = haversine_m(clat, clon, F.col(lat_col), F.col(lon_col))
    return (
        fixes.withColumn("_d2", d * d)
        .groupBy(user_col)
        .agg(
            F.count("*").alias("n_fixes"),
            F.sqrt(F.avg("_d2")).alias("rog_m"),
        )
    )


def od_flows(
    stays: DataFrame,
    z: int = 7,
    user_col: str = "user_id",
    start_col: str = "t_start",
    end_col: str = "t_end",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Origin-destination flow matrix from per-mover stay sequences: each
    consecutive stay pair becomes a directed leg, aggregated to slippy-
    tile cell pairs at zoom ``z`` — the standard mobility rollup (trip
    tables, demand matrices) and the privacy-preserving shape movement
    data ships in (k-anonymous cells, no raw traces).

    Plan: the leg construction is a lead over the mover key — if
    ``stays`` comes straight from :func:`stay_points` the frame is
    already hash-partitioned by that key, so the window adds NO exchange
    (only a sort) — then ONE shuffle on the (from, to) cell pair with
    map-side partial counts. Flow output cardinality is bounded by
    touched cell pairs, not movers.

    Output: (from_x, from_y, to_x, to_y, n_trips, avg_transit_s) at
    zoom ``z``; intra-cell legs (same tile) are kept — dropping them is
    a caller-side filter, not a semantic default.
    """
    from osmgraft.operators.tiles import tile_xy

    w = Window.partitionBy(user_col).orderBy(start_col)
    legs = (
        stays.withColumn("_nlat", F.lead(lat_col).over(w))
        .withColumn("_nlon", F.lead(lon_col).over(w))
        .withColumn("_nstart", F.lead(start_col).over(w))
        .where(F.col("_nlat").isNotNull())
    )
    fx, fy = tile_xy(F.col(lat_col), F.col(lon_col), z)
    tx, ty = tile_xy(F.col("_nlat"), F.col("_nlon"), z)
    return (
        legs.select(
            fx.alias("from_x"),
            fy.alias("from_y"),
            tx.alias("to_x"),
            ty.alias("to_y"),
            (F.col("_nstart") - F.col(end_col)).alias("_transit"),
        )
        .groupBy("from_x", "from_y", "to_x", "to_y")
        .agg(
            F.count("*").alias("n_trips"),
            F.avg("_transit").alias("avg_transit_s"),
        )
    )


def resample_track(
    fixes: DataFrame,
    interval_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts_s",
    lat_col: str = "lat",
    lon_col: str = "lon",
    order_tiebreak: str | None = None,
    max_gap_s: int | None = None,
) -> DataFrame:
    """Fixed-interval linear resampling of per-mover fix streams — the
    normalization pass before trajectory models (uniform time steps) and
    before map matching of very dense pings.

    ``max_gap_s``: pairs further apart than this emit nothing (don't
    fabricate positions across a data hole) — this also bounds the
    per-row explode fan-out at ``max_gap_s / interval_s``, the rail that
    keeps a year-long hole from producing half a million rows out of one
    input row at planet scale.

    For every consecutive fix pair (t0, t1) the output holds one row per
    grid instant g (multiple of ``interval_s``) with t0 <= g < t1,
    linearly interpolated between the two fixes; the union over pairs
    covers the half-open span [first fix, last fix) with no duplicate
    instants. Pairs shorter than the gap to the next grid line emit
    nothing (downsampling semantics), long gaps interpolate through —
    compose with :func:`stay_points`/sessionize upstream if a gap should
    break the track instead.

    ONE hash shuffle (the mover window); the grid explode and the
    interpolation are map-side Catalyst (`sequence` + arithmetic), so the
    plan is the sessionize shape with a bounded fan-out. The fraction
    ``(g - t0) / (t1 - t0)`` and both interpolations are plain double
    expressions on integer-second inputs — bit-replayable in any engine.
    """
    order = [F.col(ts_col).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    iv = int(interval_s)
    # lead columns materialize BEFORE the explode (generators cannot
    # contain window expressions)
    df = (
        fixes.withColumn("_nts", F.lead(ts_col).over(w))
        .withColumn("_nla", F.lead(lat_col).over(w))
        .withColumn("_nlo", F.lead(lon_col).over(w))
    )
    g0 = F.ceil(F.col(ts_col) / F.lit(float(iv))).cast("long") * iv
    live = F.col("_nts").isNotNull() & (g0 <= F.col("_nts") - 1)
    if max_gap_s is not None:
        live = live & (F.col("_nts") - F.col(ts_col) <= int(max_gap_s))
    grid = F.when(
        live, F.sequence(g0, F.col("_nts") - 1, F.lit(iv).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.withColumn("_g", F.explode(grid))
        .select(
            F.col(user_col),
            F.col("_g").alias(ts_col),
            (
                F.col(lat_col)
                + (F.col("_g") - F.col(ts_col)) / (F.col("_nts") - F.col(ts_col))
                * (F.col("_nla") - F.col(lat_col))
            ).alias(lat_col),
            (
                F.col(lon_col)
                + (F.col("_g") - F.col(ts_col)) / (F.col("_nts") - F.col(ts_col))
                * (F.col("_nlo") - F.col(lon_col))
            ).alias(lon_col),
        )
    )


def spike_filter(
    fixes: DataFrame,
    max_speed_ms: float,
    user_col: str = "user_id",
    ts_col: str = "ts_s",
    lat_col: str = "lat",
    lon_col: str = "lon",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """GPS spike removal: drop fixes that are isolated teleports — the
    classic single-outlier test. An INTERIOR fix is a spike iff the
    implied speed from the previous fix AND to the next fix both exceed
    ``max_speed_ms`` WHILE the direct previous→next bridge stays within
    it: a genuinely fast vehicle fails the bridge condition (its
    neighbors are also far apart) and keeps every fix; only a point
    whose removal makes the track plausible again falls. First/last
    fixes are never dropped (one leg gives no second reference —
    conservative by design).

    ONE mover window (lag+lead share the sort), haversine legs in pure
    Catalyst, zero-duration legs (same second) count as fast when the
    displacement is nonzero. Deterministic and SQL-replayable; the
    one-pass formulation intentionally does NOT re-test after removal
    (iterative re-filtering is order-dependent — run the pass twice if a
    double spike must fall).
    """
    order = [F.col(ts_col).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(user_col).orderBy(*order)

    def fast(la1, lo1, ts1, la2, lo2, ts2):
        d = haversine_m(la1, lo1, la2, lo2)
        dt = F.abs(ts2 - ts1).cast("double")
        return F.when(dt == 0, d > 0).otherwise(d / dt > max_speed_ms)

    cla, clo, cts = F.col(lat_col), F.col(lon_col), F.col(ts_col)
    pla, plo, pts = F.lag(lat_col).over(w), F.lag(lon_col).over(w), F.lag(ts_col).over(w)
    nla, nlo, nts = (
        F.lead(lat_col).over(w),
        F.lead(lon_col).over(w),
        F.lead(ts_col).over(w),
    )
    spike = (
        pts.isNotNull()
        & nts.isNotNull()
        & fast(cla, clo, cts, pla, plo, pts)
        & fast(cla, clo, cts, nla, nlo, nts)
        & ~fast(pla, plo, pts, nla, nlo, nts)
    )
    return fixes.withColumn("_spike", spike).where(~F.col("_spike")).drop("_spike")
