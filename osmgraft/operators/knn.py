"""J6: kNN joins + label deduplication via cell-ring candidate pruning.

Engine extension (north_rule); absent from the reference. The geometry is
pure Catalyst: haversine distance is built from built-in trig functions
(whole-stage codegen — no UDF), and the candidate space is pruned by a
hex-cell disk(``probe_k``) self-join: with k * cell inradius >= the search
radius, every true neighbor within the radius lies in the 3k(k+1)+1-cell
disk around the query point's cell, so the join is an equi-join on cell id
(shuffle co-partitioned by cell; dense-city skew handled by
operators/skew.py). probe_k=3 by default: finer cells + a wider probe
track the search circle ~2x tighter than disk(1) at coarse cells (the
power-of-two edge quantization can make the k=1 cell ~2x oversize), at the
cost of a 37-integer probe explode — measured faster on dense data and
identical in results (see res_for_radius).

Resolution is latitude-banded: the disk(1) guarantee must inflate the
radius by 1/cos(lat) in longitude-degrees, and a single global resolution
has to assume the worst latitude in the data — cells ~5x coarser than
equatorial data needs, i.e. up to ~25x extra candidate pairs through the
exact haversine filter. Each row is instead encoded ONCE at the finest
resolution its own |lat| band supports (the resolution is packed into the
cell id, so cells from different bands can never collide), and the whole
search stays a single equi-join: right-side rows within the search radius
of a band edge additionally emit the adjacent band's encoding, and rows
near the antimeridian emit a lon+-360 replica, all produced in one
vectorized kernel as an array<long> that Catalyst explodes. Polar caps
(|lat| >= 84.26, where 1/cos blows up) collapse to one sentinel cell per
hemisphere on both sides, which turns the cap search into an exact
per-hemisphere brute-force join INSIDE the same equi-join — no extra
plan branches, and the operator is correct at every latitude instead of
silently missing neighbors near the poles.
"""

from __future__ import annotations

import math
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from osmgraft.functions.cells import (
    _HEX_BASE_EDGE,
    hex_cell,
    hex_cell_udf,
    hex_edge_deg,
    hex_neighbors_expr,
    pack_hex,
)

EARTH_RADIUS_M = 6_371_008.8
DEG_M = EARTH_RADIUS_M * math.pi / 180.0  # meters per degree latitude

# |lat| band upper edges; cos at the edges: 0.700, 0.500, 0.250, 0.100.
# Band b covers [_BAND_LO[b], _BAND_LO[b+1]); band 4 is the polar cap.
_BAND_LO = np.array([0.0, 45.573, 60.0, 75.522, 84.261])
POLAR_CAP_LAT = float(_BAND_LO[-1])
# Sentinel "resolution" for the cap cells: above any real res (<=15), below
# 32 so the packed id keeps the int64 sign bit clear.
_SENTINEL_RES = 31


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters — pure Catalyst expression.

    Periodic in longitude (sin^2(dlon/2) is symmetric about 180), so it
    needs no antimeridian special-casing; only the *cell grid* does.
    """
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = F.sin(dphi / 2) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dlmb / 2) ** 2
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def res_for_radius(radius_m: float, min_cos_lat: float = 0.2, probe_k: int = 1) -> int:
    """Finest hex resolution satisfying the disk(``probe_k``) containment
    guarantee: any point within ``radius_m`` of a query lies in the
    3k(k+1)+1-cell disk around the query's cell. Sufficient condition:
    k * hex inradius (sqrt(3)/2 * edge, in plane degrees) >= the search
    radius in degrees, where longitude degrees are inflated by 1/cos(lat)
    up to the supported latitude (induction on k: dilating a cell union by
    one inradius stays within its one-ring expansion).

    Why probe deeper than disk(1): cell edges are powers of two, so the
    coarsest-fitting cell can be ~2x oversize and the probed area up to
    ~4x the search circle ON TOP of the 7/pi disk overhead. Finer cells +
    a wider probe track the circle better: probed-area factor is
    (3 + 3/k + 1/k^2) * (rounded-edge inflation)^2, i.e. k=3 cuts true
    candidate volume ~2-3x for radii that round badly at k=1, at the cost
    of a 37-cell probe explode (cheap codegen integers vs real pairs
    through the haversine)."""
    radius_deg = radius_m / (DEG_M * min_cos_lat)
    for res in range(15, -1, -1):
        if 0.866 * hex_edge_deg(res) * probe_k >= radius_deg:
            return res
    return 0


def _band_res(radius_m: float, probe_k: int = 1) -> tuple[np.ndarray, float]:
    """Per-band resolutions (4 hex bands; guarantee holds out to the band
    edge + the latitude margin so boundary replicas are covered too)."""
    lat_margin = radius_m / DEG_M
    res = []
    for hi in _BAND_LO[1:]:
        min_cos = math.cos(math.radians(min(hi + lat_margin, 89.9)))
        res.append(res_for_radius(radius_m, min_cos_lat=min_cos, probe_k=probe_k))
    return np.asarray(res, dtype=np.int64), lat_margin


def _sentinel(lat: np.ndarray) -> np.ndarray:
    """One constant cell per hemisphere: equi-joining on it IS the polar
    brute-force join (exact haversine filters afterwards)."""
    return pack_hex((lat > 0).astype(np.int64), np.zeros(len(lat), np.int64), _SENTINEL_RES)


def _enc_banded(lat: np.ndarray, lon: np.ndarray, res: np.ndarray) -> np.ndarray:
    """Encode at per-row res; rows with res == _SENTINEL_RES get the
    hemisphere sentinel instead of a grid cell."""
    cap = res == _SENTINEL_RES
    out = hex_cell(lat, lon, np.where(cap, 0, res))
    if cap.any():
        out = np.where(cap, _sentinel(lat), out)
    return out


def _left_cell_udf(radius_m: float, probe_k: int = 1):
    res_by_band, _ = _band_res(radius_m, probe_k)

    @F.pandas_udf("long")
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la, lo = lat.to_numpy(), lon.to_numpy()
        band = np.digitize(np.abs(la), _BAND_LO[1:])
        res = np.where(band < 4, res_by_band[np.clip(band, 0, 3)], _SENTINEL_RES)
        return pd.Series(_enc_banded(la, lo, res))

    return _enc


def _right_cells_udf(radius_m: float, probe_k: int = 1):
    res_by_band, lat_margin = _band_res(radius_m, probe_k)

    @F.pandas_udf("array<long>")
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la, lo = lat.to_numpy(), lon.to_numpy()
        n = len(la)
        ala = np.abs(la)
        band = np.digitize(ala, _BAND_LO[1:])
        own_res = np.where(band < 4, res_by_band[np.clip(band, 0, 3)], _SENTINEL_RES)

        # boundary replica: within lat_margin of a band edge, also encode at
        # the adjacent band's res so cross-band pairs survive the equi-join.
        # (band widths >> margin, so at most one edge can be within margin.)
        rep_res = np.full(n, -1, np.int64)
        lower = (band >= 1) & (ala < _BAND_LO[np.clip(band, 1, 4)] + lat_margin)
        rep_res[lower] = res_by_band[np.clip(band[lower] - 1, 0, 3)]
        hi_edge = np.where(band < 4, _BAND_LO[np.clip(band + 1, 1, 4)], 90.0)
        upper = (band < 4) & (ala >= hi_edge - lat_margin)
        up_band = np.clip(band + 1, 0, 4)
        rep_res[upper] = np.where(
            up_band[upper] < 4, res_by_band[np.clip(up_band[upper], 0, 3)], _SENTINEL_RES
        )
        # adjacent bands may share a resolution (the radius can demand the
        # same res on both sides of an edge) — then the "replica" would be
        # the own cell again and every sliver pair would be emitted twice.
        rep_res[rep_res == own_res] = -1

        # antimeridian replica: the grid is a lon/lat plane, so a row near
        # +-180 also emits its cell at lon -+ 360 (sentinels are lon-free
        # and skip this). The exact haversine is periodic, so distances of
        # replica matches are computed on the ORIGINAL coordinates.
        grid_res = np.where(own_res == _SENTINEL_RES, np.where(rep_res >= 0, rep_res, 0), own_res)
        edge = _HEX_BASE_EDGE / (np.int64(1) << grid_res).astype(np.float64)
        lon_margin = radius_m / (DEG_M * np.maximum(np.cos(np.radians(la)), 0.05)) + (probe_k + 1) * edge
        shift = np.where(lo > 180.0 - lon_margin, -360.0, np.where(lo < -180.0 + lon_margin, 360.0, 0.0))

        cells = np.full((n, 4), -1, np.int64)
        cells[:, 0] = _enc_banded(la, lo, own_res)
        m = rep_res >= 0
        if m.any():
            cells[m, 1] = _enc_banded(la[m], lo[m], rep_res[m])
        s = (shift != 0.0) & (own_res != _SENTINEL_RES)
        if s.any():
            cells[s, 2] = _enc_banded(la[s], lo[s] + shift[s], own_res[s])
        sr = (shift != 0.0) & m & (rep_res != _SENTINEL_RES)
        if sr.any():
            cells[sr, 3] = _enc_banded(la[sr], lo[sr] + shift[sr], rep_res[sr])
        return pd.Series(list(cells))

    return _enc


def _left_cand_expr(cell: Column, probe_k: int = 1) -> Column:
    """Candidate cells a left row probes. Grid rows probe the disk(1)
    neighborhood; polar-cap sentinel rows probe ONLY the sentinel cell —
    the disk(1) offset arithmetic on a sentinel id would land on the
    OPPOSITE hemisphere's sentinel ((q=1,r=0)+(-1,0) == (q=0,r=0)), turning
    every cap left row into a brute-force join against the other cap's
    right rows. Results were still correct (haversine filters the
    cross-hemisphere pairs) but the candidate blow-up is unnecessary."""
    is_sentinel = F.shiftrightunsigned(cell, 58) == F.lit(_SENTINEL_RES)
    return F.when(is_sentinel, F.array(cell)).otherwise(hex_neighbors_expr(cell, k=probe_k))


def _suffix_right(right: DataFrame) -> list[Column]:
    return [F.col(c).alias(f"{c}_r") for c in right.columns]


def _knn_candidates_at_res(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    res: int,
    left_cols: tuple[str, str],
    right_cols: tuple[str, str],
) -> DataFrame:
    """Single-resolution kernel (explicit ``res``): cell-pruned equi-join +
    exact haversine. The caller owns the disk(1) containment guarantee."""
    enc = hex_cell_udf(res)
    l = left.withColumn("_cell", enc(F.col(left_cols[0]), F.col(left_cols[1])))

    rlat, rlon = F.col(right_cols[0]), F.col(right_cols[1])
    margin = F.lit(radius_m / DEG_M) / F.greatest(F.cos(F.radians(rlat)), F.lit(0.05)) + F.lit(
        2 * hex_edge_deg(res)
    )
    east = right.where(rlon > 180.0 - margin).withColumn(right_cols[1] + "__s", rlon - 360.0)
    west = right.where(rlon < -180.0 + margin).withColumn(right_cols[1] + "__s", rlon + 360.0)
    shifted = east.unionByName(west)

    def enc_right(df: DataFrame, lon_col: str) -> DataFrame:
        out = df.withColumn("_cell_r", enc(rlat, F.col(lon_col)))
        return out.select(_suffix_right(right) + [F.col("_cell_r")])

    r_all = enc_right(right, right_cols[1]).unionByName(enc_right(shifted, right_cols[1] + "__s"))

    l_exp = l.withColumn("_cand", F.explode(hex_neighbors_expr(F.col("_cell"), k=1))).drop("_cell")
    pairs = l_exp.join(r_all, l_exp["_cand"] == r_all["_cell_r"]).drop("_cand", "_cell_r")
    dist = haversine_m(
        F.col(left_cols[0]), F.col(left_cols[1]), F.col(f"{right_cols[0]}_r"), F.col(f"{right_cols[1]}_r")
    )
    return pairs.withColumn("dist_m", dist).where(F.col("dist_m") <= radius_m)


def knn_candidates(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    res: int | None = None,
    left_cols: tuple[str, str] = ("lat", "lon"),
    right_cols: tuple[str, str] = ("lat", "lon"),
    probe_k: int = 3,
    skew_max_rows: int | None | str = "auto",
) -> DataFrame:
    """All (left, right) pairs within ``radius_m`` — cell-pruned equi-join +
    exact haversine filter. Right columns arrive suffixed with ``_r``.

    ``skew_max_rows`` (banded path): split hot cells before the equi-join —
    right rows in cells over the bound are salted (pure hash of their
    coordinates), left probe rows replicate once per salt bucket, and the
    join runs on (cell, salt). Identical pairs out (tested), but a dense
    urban cell's reduce work spreads over ceil(n/bound) tasks instead of
    pinning one. Best-effort past ``hot_cell_map``'s 64-salt replication
    cap: a cell beyond ``64 * skew_max_rows`` rows splits 64 ways
    proportionally (see :func:`osmgraft.operators.skew.hot_cell_map`).
    The default ``"auto"`` derives the bound from AQE's advisory
    partition size (:func:`osmgraft.operators.skew.auto_skew_bound`), so
    the rail is on unless explicitly disabled with ``None``.

    With ``res=None`` (default) the resolution is latitude-banded and the
    whole search — all bands, antimeridian replicas, and polar caps — is
    ONE equi-join over single-pass encodings of each side (see module
    docstring). Pass an explicit ``res`` to force one global resolution.

    No pair can be emitted twice: a right row emits at most one cell per
    (resolution, lon-replica) pair, the left disk(1) holds 7 cells of one
    resolution spanning < 1 plane-degree, and lon replicas sit ~360
    plane-degrees apart — so per left row at most one of a right row's
    emitted cells can land in the disk, and no dedup pass is needed.
    """
    if res is not None:
        # the forced-res path replicates seam rows wholesale; a pair can
        # match via both the original and the shifted replica only in the
        # seam sliver, so dedup is confined there.
        out = _knn_candidates_at_res(left, right, radius_m, res, left_cols, right_cols)
        rlat_r, rlon_r = F.col(f"{right_cols[0]}_r"), F.col(f"{right_cols[1]}_r")
        margin_r = F.lit(radius_m / DEG_M) / F.greatest(
            F.cos(F.radians(rlat_r)), F.lit(0.05)
        ) + F.lit(2 * hex_edge_deg(res))
        in_seam = (rlon_r > 180.0 - margin_r) | (rlon_r < -180.0 + margin_r)
        safe = out.where(~in_seam)
        seam = out.where(in_seam)
        return safe.unionByName(seam.dropDuplicates(seam.columns))

    l = left.withColumn(
        "_cell", _left_cell_udf(radius_m, probe_k)(F.col(left_cols[0]), F.col(left_cols[1]))
    )
    l_exp = l.withColumn(
        "_cand", F.explode(_left_cand_expr(F.col("_cell"), probe_k))
    ).drop("_cell")

    r_cells = _right_cells_udf(radius_m, probe_k)(F.col(right_cols[0]), F.col(right_cols[1]))
    r_exp = (
        right.select(_suffix_right(right) + [F.explode(r_cells).alias("_cell_r")])
        .where(F.col("_cell_r") != -1)
    )

    if skew_max_rows == "auto":
        from osmgraft.operators.skew import auto_skew_bound

        skew_max_rows = auto_skew_bound(left.sparkSession)
    if skew_max_rows:
        from osmgraft.operators.skew import hot_cell_map, replicate_cells, salt_cells

        hot = hot_cell_map(r_exp, "_cell_r", skew_max_rows)
        r_exp = salt_cells(
            r_exp, hot, "_cell_r", [f"{right_cols[0]}_r", f"{right_cols[1]}_r"]
        )
        l_exp = replicate_cells(l_exp, hot.withColumnRenamed("_cell_r", "_cand"), "_cand")
        pairs = l_exp.join(
            r_exp,
            (l_exp["_cand"] == r_exp["_cell_r"]) & (l_exp["_cell_salt"] == r_exp["_cell_salt"]),
        ).drop("_cand", "_cell_r", "_cell_salt")
    else:
        pairs = l_exp.join(r_exp, l_exp["_cand"] == r_exp["_cell_r"]).drop("_cand", "_cell_r")
    dist = haversine_m(
        F.col(left_cols[0]), F.col(left_cols[1]), F.col(f"{right_cols[0]}_r"), F.col(f"{right_cols[1]}_r")
    )
    return pairs.withColumn("dist_m", dist).where(F.col("dist_m") <= radius_m)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    radius_m: float,
    left_key: str,
    res: int | None = None,
    probe_k: int = 3,
) -> DataFrame:
    """Top-k nearest right rows per left row within ``radius_m``.

    Bounded-radius kNN (the label-dedup use case): neighbors beyond
    ``radius_m`` are irrelevant by construction, so no iterative ring
    expansion is needed.
    """
    cand = knn_candidates(left, right, radius_m, res=res, probe_k=probe_k)
    w = Window.partitionBy(left_key).orderBy(F.col("dist_m").asc())
    return cand.withColumn("knn_rank", F.row_number().over(w)).where(F.col("knn_rank") <= k)


def _dedup_frames(
    slim: DataFrame,
    radius_m: float,
    rank_col: str,
    id_col: str,
    probe_k: int,
    hot_threshold: int = 200,
    routing_gate: float = 2.0,
) -> dict[str, DataFrame]:
    """Adaptive suppression plan for :func:`dedup_labels` — intermediate
    frames exposed for the candidate-bound test.

    Suppression only needs "EXISTS a better-ranked label within r", so the
    all-pairs enumeration — quadratic in local label density: a 10^4-label
    hot cell => ~10^8 candidate pairs through the haversine — is bounded
    by routing each label through one of two sides of the SAME plan
    (no driver action; the split is a column from the stats aggregation):

    - ``cell_stats``: one groupBy over the right cell emission yields, per
      occupied cell, its min-rank LEADER row and its row count. A label
      whose own cell holds more than ``hot_threshold`` rows is HOT.
    - HOT labels probe their disk(probe_k) against leaders only — LINEAR
      (<= 3k(k+1)+1 probe rows each, one leader per cell). A hot label
      with a better-ranked leader within r is suppressed right there (in
      a dense cluster that is almost everyone); one with a better-ranked
      leader in the disk but beyond r is ``undecided`` and falls through
      to the exact join. Equivalence: any true suppressor M sits in a
      probed cell, whose leader ranks <= M — so a hot label is phase-1
      suppressed or undecided, never wrongly kept.
    - COLD labels take the exact pair join unchanged (sparse regions pay
      zero extra stages beyond the stats shuffle; the residual quadratic
      term is cold-rows-adjacent-to-hot-cells x hot density).

    Both routes apply the identical (dist <= r, rank <, id !=) predicate
    against the complete label set, so the union of suppressions equals
    the all-pairs result exactly (tested, incl. antimeridian + caps)."""
    rank_r, id_r = F.col(f"{rank_col}_r"), F.col(f"{id_col}_r")

    r_exp = slim.select(
        _suffix_right(slim)
        + [F.explode(_right_cells_udf(radius_m, probe_k)(F.col("lat"), F.col("lon"))).alias("_cell_r")]
    ).where(F.col("_cell_r") != -1)
    cell_stats = r_exp.groupBy("_cell_r").agg(
        F.min(F.struct(rank_r, id_r, F.col("lat_r"), F.col("lon_r"))).alias("_m"),
        F.count("*").alias("_n"),
    )
    # lazy checkpoint: the stats shuffle runs exactly once (on the skew
    # probe below) and its small per-cell output is cached for the three
    # routing consumers (leaders, hot flag, cold flag) IF routing engages;
    # when it doesn't, the only cost paid was that single linear pass
    cell_stats = cell_stats.localCheckpoint(eager=False)

    l_cell = _left_cell_udf(radius_m, probe_k)(F.col("lat"), F.col("lon"))
    l_all = slim.withColumn("_cell", l_cell)

    def probe_join(left_frame: DataFrame, right_frame: DataFrame) -> DataFrame:
        ex = left_frame.withColumn("_cand", F.explode(_left_cand_expr(F.col("_cell"), probe_k)))
        out = ex.join(right_frame, ex["_cand"] == right_frame["_cell_r"])
        return out.withColumn(
            "dist_m", haversine_m(F.col("lat"), F.col("lon"), F.col("lat_r"), F.col("lon_r"))
        )

    hit = (F.col("dist_m") <= radius_m) & (rank_r < F.col(rank_col)) & (id_r != F.col(id_col))

    # pay-as-you-go routing: ONE driver action probes the densest cell; if
    # no cell exceeds routing_gate x hot_threshold, the leader machinery
    # (flag join, leader probe, verdict groupBy, semi-join) cannot beat the
    # plain exact join it exists to bound, so everyone routes exact and the
    # prepass's total cost was the single stats pass. Above the gate the
    # quadratic is real: the cached stats frame feeds the three routing
    # consumers for free, and the hot list is nonempty by construction
    # (mx > gate >= hot_threshold), small by construction
    # (<= total/hot_threshold entries), so flagging is a broadcast left
    # join — no shuffle of the label side.
    mx = cell_stats.agg(F.max("_n")).first()[0] or 0
    leaders = cell_stats.select("_cell_r", "_m.*")
    if mx <= routing_gate * hot_threshold:
        hot_l = cold_l = None
        phase1 = undecided = None
        exact_left = l_all
        cold_count_frame = l_all
    else:
        hot_cells = cell_stats.where(F.col("_n") > hot_threshold).select(
            F.col("_cell_r").alias("_cell"), F.lit(True).alias("_hot")
        )
        flagged = l_all.join(F.broadcast(hot_cells), "_cell", "left")
        hot_l = flagged.where(F.col("_hot")).drop("_hot")
        cold_l = flagged.where(F.col("_hot").isNull()).drop("_hot")
        cold_count_frame = cold_l

        hp = probe_join(hot_l, leaders).where(rank_r < F.col(rank_col))
        verdict = hp.groupBy(id_col).agg(
            F.max(((F.col("dist_m") <= radius_m) & (id_r != F.col(id_col))).cast("int")).alias("_s")
        )
        phase1 = verdict.where(F.col("_s") == 1).select(id_col)
        undecided = hot_l.join(verdict.where(F.col("_s") == 0).select(id_col), id_col, "left_semi")
        exact_left = undecided.unionByName(cold_l)

    # duplicates are harmless to the final left_anti join, so no
    # union-level distinct; phase2 keeps one to collapse the (id x
    # suppressor-count) fan-out before it ships
    phase2 = probe_join(exact_left, r_exp).where(hit).select(id_col).distinct()
    suppressed = phase2 if phase1 is None else phase1.unionByName(phase2)
    return {
        "leaders": leaders,
        "phase1": phase1,
        "undecided": undecided,
        "cold": cold_count_frame,
        "suppressed": suppressed,
        "routed": phase1 is not None,
        "max_cell_rows": mx,
    }


def dedup_labels(
    labels: DataFrame,
    radius_m: float,
    rank_col: str = "rank",
    id_col: str = "osm_id",
    res: int | None = None,
    probe_k: int = 3,
    materialize: bool = True,
    prepass: bool = True,
    hot_threshold: int = 200,
    prepass_min_rows: int = 100_000,
    routing_gate: float = 2.0,
) -> DataFrame:
    """kNN label dedup: suppress any label that has a MORE important label
    (smaller ``rank_col``) within ``radius_m``. Deterministic because the
    global rank is a total order.

    ``prepass`` (default) routes through the adaptive hot/cold split
    (:func:`_dedup_frames`), which bounds the dense-cell blow-up: the
    all-pairs path enumerates O(n^2) candidate pairs inside a hot cell,
    the leader route O(n) + exact pairs for the (small) undecided
    residue, while cold (sparse) cells keep the exact join's cost profile
    plus one stats shuffle. ``prepass=False`` keeps the single-join exact
    path everywhere (the oracle-shaped reference). Results are identical
    (tested, and the osm_dedup_labels DuckDB oracle runs the default).

    The prepass is pay-as-you-go on two levels, so small or unskewed
    inputs never fund machinery they don't need:

    - **row gate** — below ``prepass_min_rows`` (counted on the already-
      checkpointed slim frame, ~free) the exact join runs directly: at
      that size the prepass's fixed multi-stage overhead (stats pass +
      flag join + leader probe + verdict + semi-join scheduling) costs
      more wall-clock than the bounded quadratic it avoids, and the
      ``skew_max_rows`` salting rail still spreads a degenerate cell
      across tasks. Set ``prepass_min_rows=0`` to force routing.
    - **skew gate** — above the row gate, one driver action probes
      ``max(cell rows)``; if no cell exceeds ``routing_gate *
      hot_threshold`` the stats pass is the only cost paid and everyone
      routes exact (see :func:`_dedup_frames`).

    ``materialize`` (default) localCheckpoints the slim (id, rank, lat,
    lon) projection once: the joins otherwise re-derive ``labels`` several
    times, and a nondeterministic upstream (e.g. an unranked frame) could
    disagree with itself between the join sides. The slim frame is
    ~32 B/row — far cheaper than re-running the producing pipeline."""
    slim = labels.select(id_col, rank_col, "lat", "lon")
    if materialize:
        slim = slim.localCheckpoint(eager=True)

    # count on the checkpointed frame is ~free and feeds both gates below;
    # an unmaterialized frame would re-run the producing pipeline just to
    # count it, so the row gate defers to the skew gate inside _dedup_frames
    n_rows = slim.count() if materialize else None

    use_prepass = prepass and res is None
    if use_prepass and prepass_min_rows > 0 and n_rows is not None:
        use_prepass = n_rows >= prepass_min_rows

    if use_prepass:
        fr = _dedup_frames(
            slim, radius_m, rank_col, id_col, probe_k, hot_threshold, routing_gate
        )
        suppressed = fr["suppressed"]
    else:
        # the salting rail can't trigger when total rows <= its auto bound
        # (no cell can exceed the bound), so skip its count pre-pass too
        skew: int | None | str = "auto"
        if n_rows is not None:
            from osmgraft.operators.skew import auto_skew_bound

            if n_rows <= auto_skew_bound(slim.sparkSession):
                skew = None
        pairs = knn_candidates(
            slim, slim, radius_m, res=res, probe_k=probe_k, skew_max_rows=skew
        )
        suppressed = (
            pairs.where(
                (F.col(f"{rank_col}_r") < F.col(rank_col))
                & (F.col(f"{id_col}_r") != F.col(id_col))
            )
            .select(id_col)
            .distinct()
        )
    return labels.join(suppressed, id_col, "left_anti")
