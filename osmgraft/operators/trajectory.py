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
