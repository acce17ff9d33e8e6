"""Area-POI path: J1/J2 semi-joins, A1 polygon assembly, A2 centroid,
P8 size cap, P9 completeness filter, U1 union feed.

Reference dataflow: /root/reference/src/input/osminputhelper.cpp:586-667
(3 PBF passes + sequential finalize). Spark shape: the passes are joins;
the finalize is a grouped Arrow kernel bounded by the P8 cap (<=100 outer
node refs per relation, osminputhelper.cpp:226-235), so per-group Python
cost is O(100).

UPSTREAM BUG (documented delta): ``assemblePolygon`` checks
``adjacent.count(startNode) == 1`` (osminputhelper.cpp:142-144) — for
``std::unordered_map`` that is ALWAYS true, so the reference bails out and
silently drops EVERY multi-segment relation; only single-segment relations
survive (via the fast path at :100-113). The intended check is clearly the
dangling-endpoint test ``adjacent.at(startNode).size() == 1``. We implement
the INTENDED semantics by default and keep ``literal_bugs=True`` to
reproduce the reference binary exactly; both behaviors are pinned by tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

MAX_OUTER_NODE_REFS = 100  # osminputhelper.cpp:226-235


# ---------------------------------------------------------------------------
# A1: pure-Python assembly core (runs inside the grouped Arrow kernel)
# ---------------------------------------------------------------------------


def assemble_polygon(
    seg_ids: list[int],
    segments: dict[int, list[int]],
    literal_bugs: bool = False,
) -> list[list[int]]:
    """assemblePolygon (osminputhelper.cpp:91-192): stitch way segments into
    closed ring(s), flipping segment direction as needed. Returns rings as
    node-id lists whose first element equals the last (the walk re-appends
    the start node), or fewer/no rings on bail (missing segment/node)."""
    if len(seg_ids) == 1:
        ring = list(segments[seg_ids[0]])
        if ring[0] != ring[-1]:
            ring.append(ring[0])  # force-close unclosed data (:100-113)
        return [ring]

    adjacent: dict[int, list[int]] = {}
    for sid in seg_ids:
        nodes = segments[sid]
        adjacent.setdefault(nodes[0], []).append(sid)
        adjacent.setdefault(nodes[-1], []).append(sid)

    result: list[list[int]] = []
    while adjacent:
        start = next(iter(adjacent))
        if not adjacent[start]:
            del adjacent[start]
            continue
        if literal_bugs:
            # adjacent.count(startNode)==1 is always true -> immediate bail (:142-144)
            return result
        if len(adjacent[start]) == 1:
            return result  # intended: dangling endpoint, ring can't close

        cur_seg = adjacent[start].pop(0)
        seg = segments[cur_seg]
        ring = list(seg) if seg[0] == start else list(reversed(seg))
        cur = ring[-1]
        if cur in adjacent:
            # std::list::remove erases ALL equal elements (:157)
            adjacent[cur] = [s for s in adjacent[cur] if s != cur_seg]

        while cur != start:
            if cur not in adjacent or not adjacent[cur]:
                return result  # missing nodes -> bail with rings so far (:159-171)
            cur_seg = adjacent[cur].pop(0)
            if cur_seg not in segments:
                return result
            seg = segments[cur_seg]
            if seg[0] == cur:
                ring.extend(seg[1:])
            elif seg[-1] == cur:
                ring.extend(list(reversed(seg))[1:])
            else:
                return result
            cur = ring[-1]
            if cur in adjacent:
                adjacent[cur] = [s for s in adjacent[cur] if s != cur_seg]

        result.append(ring)
    return result


def centroid_of_rings(
    rings: list[list[int]], coords: dict[int, tuple[float, float]]
) -> tuple[float, float]:
    """A2 (osminputhelper.cpp:237-263): plain average over ring node
    occurrences — shared/duplicated nodes counted per occurrence, including
    the re-appended start node. Not the true polygon centroid, by design."""
    s_lat = s_lon = 0.0
    n = 0
    for ring in rings:
        for node in ring:
            la, lo = coords[node]
            s_lat += la
            s_lon += lo
            n += 1
    return s_lat / n, s_lon / n


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

_AREA_OUT = StructType(
    [
        StructField("rel_id", LongType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
    ]
)


def _finalize_batches(pos_key: str, literal_bugs: bool, passthrough: tuple[str, ...] = ()):
    """Batched A1+A2 kernel over packed (rel_id, mem) rows — thousands of
    relations per Arrow batch, plain-Python inner loop bounded by P8.

    ``passthrough`` columns (e.g. the tags map) ride through the kernel for
    surviving rows, so relation metadata needs NO re-join after assembly —
    a re-join would re-execute the whole member-join subtree a second time
    (ReuseExchange does not fire across the differing projections)."""
    from collections.abc import Iterator

    def finalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rel: list[int] = []
            out_lat: list[float] = []
            out_lon: list[float] = []
            out_keep: list[int] = []
            for row_i, (rel_id, mem) in enumerate(zip(pdf["rel_id"], pdf["mem"])):
                segs: dict[int, list[int]] = {}
                coords: dict[int, tuple[float, float]] = {}
                outer_ids: list[tuple[int, int]] = []
                for m in mem:
                    wid = int(m["way_id"])
                    node_ids = [int(x) for x in m["node_ids"]]
                    segs[wid] = node_ids
                    for nid, la, lo in zip(node_ids, m["lats"], m["lons"]):
                        coords[nid] = (float(la), float(lo))
                    if m["role"] == 0:
                        outer_ids.append((int(m[pos_key]), wid))
                outer_ids.sort()
                outer = [w for _, w in outer_ids]
                if not outer:
                    continue
                # P8: total outer node refs cap (:226-235)
                if sum(len(segs[w]) for w in outer) > MAX_OUTER_NODE_REFS:
                    continue
                rings = assemble_polygon(outer, segs, literal_bugs=literal_bugs)
                if not rings:
                    continue
                lat, lon = centroid_of_rings(rings, coords)
                out_rel.append(int(rel_id))
                out_lat.append(lat)
                out_lon.append(lon)
                out_keep.append(row_i)
            out = {"rel_id": out_rel, "lat": out_lat, "lon": out_lon}
            for c in passthrough:
                vals = pdf[c]
                out[c] = [vals.iloc[i] for i in out_keep]
            yield pd.DataFrame(out)

    return finalize


def packed_area_centroids(
    rel_packed: DataFrame, literal_bugs: bool = False, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """(rel_id, lat, lon[, passthrough...]) straight from the decode stage's
    packed relations (rel_id, mem, has_missing, tags) — zero extra
    shuffles: P9 and P8 are Catalyst filters on the packed row, assembly is
    one narrow Arrow pass, and metadata columns ride through the kernel."""
    outer_refs = F.aggregate(
        F.filter(F.col("mem"), lambda m: m["role"] == F.lit(0)),
        F.lit(0),
        lambda acc, m: acc + F.size(m["node_ids"]),
    )
    src = (
        rel_packed.where(~F.col("has_missing"))  # P9 (:637-655)
        .where(outer_refs.between(1, MAX_OUTER_NODE_REFS))  # P8 (:226-235)
        .select("rel_id", "mem", *passthrough)
    )
    schema = StructType(
        _AREA_OUT.fields + [rel_packed.schema[c] for c in passthrough]
    )
    return src.mapInPandas(_finalize_batches("ord", literal_bugs, passthrough), schema=schema)


def area_centroids(
    relations: DataFrame,
    ways: DataFrame,
    nodes: DataFrame | None = None,
    segments: DataFrame | None = None,
    literal_bugs: bool = False,
) -> DataFrame:
    """(rel_id, lat, lon) for every relation that survives P8/P9/A1.

    Two coordinate-resolution strategies with identical results:
    - ``segments`` given (default path): coordinate arrays travel with the
      decoded segment rows — no node explode, minimal shuffle (the 100-TB
      plan: one shuffle to group by rel_id, group size bounded by P8).
    - ``nodes`` given: reference-faithful hash-join resolution (J2/J3):
      explode way node_ids -> join nodes -> regroup. Kept for parity tests
      and for inputs where geometry is only available per node.

    Prefer :func:`packed_area_centroids` when the decode stage's packed
    relations frame is available — it shares the decode shuffle instead of
    re-exploding members.
    """
    # P9: completeness — drop relations referencing missing ways (:637-655)
    rel = relations.where(~F.col("has_missing"))

    # one row per member, tagged with role + position (outer drives P8+centroid)
    members = (
        rel.select("rel_id", F.posexplode("outer").alias("pos", "way_id"), F.lit(0).alias("role"))
        .unionByName(
            rel.select("rel_id", F.posexplode("inner").alias("pos", "way_id"), F.lit(1).alias("role"))
        )
    )

    if segments is not None:
        seg_src = segments.select("way_id", "node_ids", "lats", "lons")
        joined = members.join(seg_src, "way_id")
    else:
        if nodes is None:
            raise ValueError("need segments or nodes")
        exploded = ways.select("way_id", F.posexplode("node_ids").alias("npos", "node_id"))
        resolved = exploded.join(nodes, "node_id")  # J3 hash join
        regrouped = (
            resolved.groupBy("way_id")
            .agg(
                F.sort_array(F.collect_list(F.struct("npos", "node_id", "lat", "lon"))).alias("s")
            )
            .select(
                "way_id",
                F.transform("s", lambda x: x["node_id"]).alias("node_ids"),
                F.transform("s", lambda x: x["lat"]).alias("lats"),
                F.transform("s", lambda x: x["lon"]).alias("lons"),
            )
        )
        joined = members.join(regrouped, "way_id")

    # Pack each relation into ONE row via a Catalyst agg, then finalize with
    # mapInPandas over LARGE Arrow batches (thousands of relations per
    # batch). A groupBy().applyInPandas here would build one pandas frame
    # per relation — measured ~2ms/group fixed overhead, i.e. 39s for 18k
    # relations even with a no-op kernel; batched it is <2s. Group payload
    # is bounded by P8 (<=100 outer refs), so a packed row stays tiny.
    packed = joined.groupBy("rel_id").agg(
        F.collect_list(
            F.struct("pos", "role", "way_id", "node_ids", "lats", "lons")
        ).alias("mem")
    )
    return packed.mapInPandas(_finalize_batches("pos", literal_bugs), schema=_AREA_OUT)


def area_pois(
    relations: DataFrame,
    ways: DataFrame,
    nodes: DataFrame | None = None,
    segments: DataFrame | None = None,
    packed: DataFrame | None = None,
    literal_bugs: bool = False,
) -> DataFrame:
    """Finished area POIs: (osm_id, lat, lon, tags) — ready for U1 union
    with node POIs (osminputhelper.cpp:706-734). With ``packed`` (the
    decode stage's single-shuffle relations frame) the whole path is one
    shuffle + one narrow Arrow pass."""
    if packed is not None:
        # tags (and the literal-name column when present) ride THROUGH the
        # assembly kernel — re-joining them afterwards would execute the
        # member-join subtree twice (projections differ, so ReuseExchange
        # cannot deduplicate it)
        extra = ["_name_lit"] if "_name_lit" in packed.columns else []
        cents = packed_area_centroids(
            packed, literal_bugs=literal_bugs, passthrough=tuple(["tags"] + extra)
        )
        return cents.select(F.col("rel_id").alias("osm_id"), "lat", "lon", "tags", *extra)
    cents = area_centroids(
        relations, ways, nodes=nodes, segments=segments, literal_bugs=literal_bugs
    )
    extra = ["_name_lit"] if "_name_lit" in relations.columns else []
    tags_src = relations.select("rel_id", "tags", *extra)
    return cents.join(tags_src, "rel_id").select(
        F.col("rel_id").alias("osm_id"), "lat", "lon", "tags", *extra
    )
