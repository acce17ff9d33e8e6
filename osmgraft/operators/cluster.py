"""Distributed DBSCAN over lat/lon points — density clustering for POI
conflation (merge duplicate venue submissions), hotspot discovery, and
stay-point regionalization.

Engine extension (north_rule); absent from the reference. The classic
algorithm (Ester et al., KDD'96) is sequential and arrival-order
dependent at the border points; this operator implements the standard
deterministic distributed formulation:

- eps-neighbor pairs come from the engine's cell-pruned radius join
  (:func:`osmgraft.operators.knn.knn_candidates` — latitude-banded
  covering, exact haversine, skew rail on by default), never an
  all-pairs product;
- a point is CORE iff its eps-neighborhood holds >= ``min_pts`` points
  (itself included — the textbook count);
- clusters are the connected components of the core-core eps-graph,
  labeled by the component's minimum point id via the alternating-star
  algorithm (:func:`osmgraft.operators.dedup.connected_components`,
  O(log n) shuffle rounds); a core with no core neighbor is its own
  singleton cluster;
- a BORDER point (non-core with a core neighbor) joins the minimum
  cluster label among its core neighbors — the one place the textbook
  algorithm is nondeterministic (first-reached wins); pinning min makes
  the result a pure function of the input, identical across retries,
  partitionings, and engines;
- everything else is NOISE (cluster null).

Shuffle accounting: one radius equi-join, one degree groupBy (rides the
pair key), the CC rounds (log-bounded, edges only among cores), and one
border min-aggregate. No step materializes more than the eps-pair set,
which density-bounded data keeps linear in the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmgraft.operators.dedup import connected_components
from osmgraft.operators.knn import knn_candidates


def dbscan(
    points: DataFrame,
    eps_m: float,
    min_pts: int,
    id_col: str = "pid",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """``(id, cluster, role)`` for every input point: role in
    ``core | border | noise``; ``cluster`` is the component-minimum core
    id (null for noise). ``points`` must carry unique ``id_col``."""
    pts = points.select(
        F.col(id_col).alias("_id"), F.col(lat_col).alias("_la"), F.col(lon_col).alias("_lo")
    )
    pairs = (
        knn_candidates(
            pts,
            pts,
            radius_m=eps_m,
            left_cols=("_la", "_lo"),
            right_cols=("_la", "_lo"),
        )
        .where(F.col("_id") != F.col("_id_r"))
        .select(F.col("_id").alias("src"), F.col("_id_r").alias("dst"))
        # three consumers (degree, core-core edges, border assignment) plus
        # the first CC round would each re-run the radius join otherwise
        .localCheckpoint(eager=True)
    )
    # left join from the point set so zero-neighbor points carry degree 0
    # (they are cores when min_pts <= 1 — the pair set never mentions them)
    deg = (
        pts.select(F.col("_id").alias("src"))
        .join(pairs.groupBy("src").agg(F.count("*").alias("_deg")), "src", "left")
        .select("src", F.coalesce(F.col("_deg"), F.lit(0)).alias("_deg"))
    )
    core = deg.where(F.col("_deg") >= min_pts - 1).select(F.col("src").alias("_cid"))

    core_edges = (
        pairs.join(core.withColumnRenamed("_cid", "src"), "src")
        .join(core.withColumnRenamed("_cid", "dst"), "dst")
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    comp = connected_components(core_edges)  # (id, component = min reachable)
    core_lbl = core.join(comp, core["_cid"] == comp["id"], "left").select(
        F.col("_cid").alias("_id"),
        F.coalesce(F.col("component"), F.col("_cid")).alias("cluster"),
    )

    border = (
        pairs.join(core_lbl.withColumnRenamed("_id", "dst"), "dst")
        .join(core_lbl.select(F.col("_id").alias("src")), "src", "left_anti")
        .groupBy("src")
        .agg(F.min("cluster").alias("cluster"))
        .select(F.col("src").alias("_id"), "cluster")
    )

    labeled = core_lbl.withColumn("role", F.lit("core")).unionByName(
        border.withColumn("role", F.lit("border"))
    )
    return (
        pts.select("_id")
        .join(labeled, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("cluster"),
            F.coalesce(F.col("role"), F.lit("noise")).alias("role"),
        )
    )
