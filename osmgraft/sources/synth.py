"""Deterministic distributed generator for the interleaved documents table.

Produces the FIXTURES.md §1 shapes with NO external data: node docs, area
docs (multipolygon relations as ordered segment blobs), and admin-polygon
docs, plus the geometry-blob side table. Runs AS A SPARK JOB
(``spark.range -> mapInPandas``) so the same generator scales from the
pytest fixtures (hundreds of docs) to the bench table (millions) to the
10^12-doc target — per-document determinism comes from a counter-based RNG
keyed on ``(seed, doc_index)``, independent of partitioning.

Spatial layout is Zipf-skewed around K cluster centers so dense cells
exist for the skew/salting paths (FIXTURES.md §1, "Zipf-skewed urban
clusters").
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from osmgraft.sources import geoblob
from osmgraft.schemas import BLOBS, DOCUMENTS

K_CLUSTERS = 256

_WORDS = (
    "Neu Alt Ober Unter Bad Gross Klein Sankt Hohen Wald Berg Tal Feld See "
    "Stein Burg Dorf Stadt Hof Haus Kirch Muehl Bach Brunn Eich Linden "
    "Rosen Birken Ahorn Weiden Felsen Sonnen Morgen Abend Winter Sommer"
).split()
_SUFFIX = ("heim", "hausen", "ingen", "stadt", "dorf", "berg", "tal", "furt", "brücke", "weiler")

PLACES = ("city", "town", "village", "hamlet", "suburb")
PLACE_P = (0.05, 0.15, 0.30, 0.30, 0.20)
AMENITIES = ("school", "university", "library", "hospital", "cafe", "restaurant", "bench", "parking")
AMENITY_P = (0.20, 0.05, 0.10, 0.08, 0.20, 0.12, 0.15, 0.10)


@dataclass(frozen=True)
class SynthParams:
    n_docs: int
    seed: int = 42
    frac_nodes: float = 0.90
    frac_areas: float = 0.08  # remainder = admin polygons

    @property
    def n_nodes(self) -> int:
        return int(self.n_docs * self.frac_nodes)

    @property
    def n_areas(self) -> int:
        return int(self.n_docs * self.frac_areas)


def _cluster_centers(seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    rng = np.random.default_rng([seed, 10**9])
    lats = rng.uniform(-60.0, 70.0, K_CLUSTERS)
    lons = rng.uniform(-180.0, 180.0, K_CLUSTERS)
    w = 1.0 / np.arange(1, K_CLUSTERS + 1)  # Zipf weights -> skewed cells
    return lats, lons, w / w.sum()


def _name(rng: np.random.Generator) -> str:
    style = rng.random()
    w1 = _WORDS[rng.integers(len(_WORDS))]
    w2 = _WORDS[rng.integers(len(_WORDS))]
    sfx = _SUFFIX[rng.integers(len(_SUFFIX))]
    if style < 0.35:
        return f"{w1}{sfx}"
    if style < 0.60:
        return f"{w1} {w2}{sfx}"
    if style < 0.75:
        return f"{w1}-{w2}{sfx}"
    if style < 0.85:
        return f"{w1}{sfx}/{w2}{sfx}"
    if style < 0.95:  # long multi-word (exercises median split)
        w3 = _WORDS[rng.integers(len(_WORDS))]
        return f"{w1}{sfx} {w2}{sfx} {w3}{sfx}"
    # embedded newline forms (exercises L2 normalization)
    form = ["\r\n", "\u2028", "\r"][rng.integers(3)]
    return f"{w1}{sfx}{form}{w2}{sfx}"


def _tag_spans(tags: list[tuple[str, str]], geom_refs: list[str], rng: np.random.Generator):
    """Interleave tag + geom spans; offsets are the final order (geom spans
    keep their relative order = relation member order)."""
    spans = [("tag", f"{k}={v}", None) for k, v in tags]
    insert_at = int(rng.integers(0, len(spans) + 1)) if spans else 0
    for j, ref in enumerate(geom_refs):
        spans.insert(insert_at + j, ("geom", None, f"geom://{ref}"))
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i} for i, (k, t, m) in enumerate(spans)
    ]


def _node_doc(i: int, rng: np.random.Generator, centers) -> tuple[dict, list[dict]]:
    clats, clons, cw = centers
    c = rng.choice(K_CLUSTERS, p=cw)
    lat = float(np.clip(clats[c] + rng.normal(0, 0.05), -90, 90))
    lon = float(((clons[c] + rng.normal(0, 0.05) + 180) % 360) - 180)
    osm_id = i + 1

    tags: list[tuple[str, str]] = []
    if rng.random() < 0.60:  # settlement profile
        place = str(rng.choice(PLACES, p=PLACE_P))
        tags.append(("place", place))
        if rng.random() < 0.95:
            tags.append(("name", _name(rng)))
        if rng.random() < 0.80:
            pop = int(10 ** rng.uniform(2.0, 7.3))
            tags.append(("population", str(pop)))
        if rng.random() < 0.10:
            tags.append(("name:de", _name(rng)))
        if rng.random() < 0.10:
            tags.append(("name:en", _name(rng)))
        if rng.random() < 0.05:
            tags.append(("official_name", _name(rng)))
    else:  # amenity profile
        amenity = str(rng.choice(AMENITIES, p=AMENITY_P))
        tags.append(("amenity", amenity))
        if rng.random() < 0.60:
            tags.append(("name", _name(rng)))
        if rng.random() < 0.30:
            tags.append(("capacity", str(int(rng.integers(10, 5000)))))
    if rng.random() < 0.30:
        tags.append(("source", "survey"))

    blob_id = f"pt-{osm_id}"
    doc = {"doc_id": f"node/{osm_id}", "spans": _tag_spans(tags, [blob_id], rng)}
    blob = {"blob_id": blob_id, "payload": geoblob.pack_point(lat, lon)}
    return doc, [blob]


def _ring(rng: np.random.Generator, lat0: float, lon0: float, m: int, radius: float):
    """Closed convex-ish ring of m distinct vertices around (lat0, lon0)."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, m))
    r = radius * (0.7 + 0.6 * rng.random(m))
    lats = lat0 + r * np.sin(ang)
    lons = lon0 + r * np.cos(ang)
    return lats, lons


def _segment_blobs(
    rel_tag: int,
    ring_lats: np.ndarray,
    ring_lons: np.ndarray,
    node_base: int,
    role: int,
    n_segs: int,
    rng: np.random.Generator,
) -> list[tuple[str, bytes]]:
    """Split a closed ring into n_segs way segments sharing endpoints; some
    segments reversed (the stitcher must flip, osminputhelper.cpp:63-89)."""
    m = len(ring_lats)
    node_ids = node_base + np.arange(m, dtype=np.int64)
    cuts = sorted(rng.choice(np.arange(1, m), size=min(n_segs - 1, m - 1), replace=False).tolist()) if n_segs > 1 else []
    bounds = [0, *cuts, m]
    out = []
    for k in range(len(bounds) - 1):
        lo, hi = bounds[k], bounds[k + 1]
        idx = np.arange(lo, hi + 1)  # include shared endpoint
        idx[idx == m] = 0  # wrap: last segment closes at first vertex
        ids, la, lo_ = node_ids[idx], ring_lats[idx], ring_lons[idx]
        if rng.random() < 0.4:  # reversed segment
            ids, la, lo_ = ids[::-1], la[::-1], lo_[::-1]
        way_id = 10**9 + rel_tag * 10 + k
        blob_id = f"seg-{way_id}"
        out.append((blob_id, geoblob.pack_segment(role, way_id, ids, la, lo_)))
    return out


def _area_doc(i: int, rng: np.random.Generator, centers) -> tuple[dict, list[dict]]:
    clats, clons, cw = centers
    c = rng.choice(K_CLUSTERS, p=cw)
    lat0 = float(np.clip(clats[c] + rng.normal(0, 0.05), -89, 89))
    lon0 = float(((clons[c] + rng.normal(0, 0.05) + 180) % 360) - 180)
    rel_id = 10**8 + i

    oversize = rng.random() < 0.03  # > 100 outer node refs -> P8 drop
    m = int(rng.integers(101, 160)) if oversize else int(rng.integers(4, 31))
    n_segs = int(rng.integers(1, 5))
    ring_lats, ring_lons = _ring(rng, lat0, lon0, m, 0.01)
    node_base = 10**10 + i * 400
    blobs = _segment_blobs(8 * i, ring_lats, ring_lons, node_base, geoblob.ROLE_OUTER, n_segs, rng)

    if rng.random() < 0.10:  # inner ring
        ilats, ilons = _ring(rng, lat0, lon0, int(rng.integers(4, 8)), 0.002)
        blobs += _segment_blobs(8 * i + 1, ilats, ilons, node_base + 200, geoblob.ROLE_INNER, 1, rng)
    if rng.random() < 0.03:  # unknown member role -> relation ignored (S2)
        ulats, ulons = _ring(rng, lat0, lon0, 4, 0.001)
        blobs += _segment_blobs(8 * i + 2, ulats, ulons, node_base + 300, geoblob.ROLE_UNKNOWN, 1, rng)

    refs = [b for b, _ in blobs]
    if rng.random() < 0.02:  # dangling ref -> P9 completeness drop
        refs.append(f"seg-missing-{rel_id}")

    tags: list[tuple[str, str]] = []
    if rng.random() < 0.70:
        tags.append(("place", str(rng.choice(("suburb", "village")))))
        tags.append(("name", _name(rng)))
        if rng.random() < 0.5:
            tags.append(("population", str(int(10 ** rng.uniform(2.0, 5.0)))))
    else:
        tags.append(("amenity", str(rng.choice(("school", "university", "hospital")))))
        if rng.random() < 0.7:
            tags.append(("name", _name(rng)))

    doc = {"doc_id": f"rel/{rel_id}", "spans": _tag_spans(tags, refs, rng)}
    return doc, [{"blob_id": b, "payload": p} for b, p in blobs]


def _admin_doc(i: int, rng: np.random.Generator, centers) -> tuple[dict, list[dict]]:
    clats, clons, _ = centers
    c = i % K_CLUSTERS  # admin region per cluster, round-robin
    lat0, lon0 = float(np.clip(clats[c], -85, 85)), float(clons[c])
    poly_id = 10**7 + i
    m = int(rng.integers(6, 16))
    ring_lats, ring_lons = _ring(rng, lat0, lon0, m, 0.25)
    node_base = 2 * 10**10 + i * 400
    blobs = _segment_blobs(8 * i + 3, ring_lats, ring_lons, node_base, geoblob.ROLE_OUTER, 1, rng)
    tags = [
        ("boundary", "administrative"),
        ("admin_level", str(int(rng.integers(4, 9)))),
        ("name", f"Region {poly_id}"),
    ]
    doc = {"doc_id": f"admin/{poly_id}", "spans": _tag_spans(tags, [b for b, _ in blobs], rng)}
    return doc, [{"blob_id": b, "payload": p} for b, p in blobs]


def _make(i: int, p: SynthParams, centers) -> tuple[dict, list[dict]]:
    rng = np.random.default_rng([p.seed, i])
    if i < p.n_nodes:
        return _node_doc(i, rng, centers)
    if i < p.n_nodes + p.n_areas:
        return _area_doc(i - p.n_nodes, rng, centers)
    return _admin_doc(i - p.n_nodes - p.n_areas, rng, centers)


def synth_documents(spark: SparkSession, p: SynthParams, partitions: int | None = None) -> DataFrame:
    centers = _cluster_centers(p.seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_make(int(i), p, centers)[0] for i in pdf["id"]]
            yield pd.DataFrame({"doc_id": [r["doc_id"] for r in rows], "spans": [r["spans"] for r in rows]})

    rng = spark.range(p.n_docs, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=DOCUMENTS)


def synth_blobs(spark: SparkSession, p: SynthParams, partitions: int | None = None) -> DataFrame:
    centers = _cluster_centers(p.seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for i in pdf["id"]:
                out.extend(_make(int(i), p, centers)[1])
            yield pd.DataFrame(
                {"blob_id": [b["blob_id"] for b in out], "payload": [b["payload"] for b in out]}
            )

    rng = spark.range(p.n_docs, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=BLOBS)


def write_synth(spark: SparkSession, out_dir: str, p: SynthParams, partitions: int | None = None) -> None:
    synth_documents(spark, p, partitions).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    synth_blobs(spark, p, partitions).write.mode("overwrite").parquet(f"{out_dir}/blobs.parquet")
