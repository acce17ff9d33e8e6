"""Fixed StructType schemas for every frame the engine exchanges.

Mirrors the reference's fixed, code-defined row shapes (SURVEY.md §1):
``OsmPoi`` /root/reference/src/primitives/osmpoi.h:33-92, ``SegmentMap`` /
``NodeMap`` /root/reference/src/input/osminputhelper.cpp:361,416, ``LabelBall``
/root/reference/src/label/labelhelper.h:34-57 — lifted to the interleaved
documents graft shape of BASELINE.json.input_hint.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Primary input: interleaved text+media documents (BASELINE.json.input_hint)
# ---------------------------------------------------------------------------

SPAN = StructType(
    [
        StructField("kind", StringType(), False),       # 'tag' | 'geom'
        StructField("text", StringType(), True),        # 'key=value' for tag spans
        StructField("media_ref", StringType(), True),   # 'geom://<blob-id>' for geom spans
        StructField("offset", IntegerType(), False),    # 0-based span order
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),     # 'node/<id>' | 'rel/<id>' | 'admin/<id>'
        StructField("spans", ArrayType(SPAN, False), False),
    ]
)

# Geometry blobs referenced by media spans — opaque binary payloads decoded by
# sources/geoblob.py (the "media object store" side table).
BLOBS = StructType(
    [
        StructField("blob_id", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Decoded intermediate frames (FIXTURES.md §2)
# ---------------------------------------------------------------------------

# node-POI candidates + finished POIs (reference OsmPoi)
POIS = StructType(
    [
        StructField("osm_id", LongType(), False),
        StructField("kind", StringType(), False),       # 'node' | 'area'
        StructField("lat", DoubleType(), False),
        StructField("lon", DoubleType(), False),
        StructField("tags", MapType(StringType(), StringType(), True), False),
        StructField("level_id", LongType(), False),
        StructField("name", StringType(), True),
    ]
)

WAYS = StructType(
    [
        StructField("way_id", LongType(), False),
        StructField("node_ids", ArrayType(LongType(), False), False),
    ]
)

NODES = StructType(
    [
        StructField("node_id", LongType(), False),
        StructField("lat", DoubleType(), False),
        StructField("lon", DoubleType(), False),
    ]
)

RELATIONS = StructType(
    [
        StructField("rel_id", LongType(), False),
        StructField("tags", MapType(StringType(), StringType(), True), False),
        StructField("outer", ArrayType(LongType(), False), False),
        StructField("inner", ArrayType(LongType(), False), False),
    ]
)

# assembled outer rings per relation: ordered coordinates, ring index
RINGS = StructType(
    [
        StructField("rel_id", LongType(), False),
        StructField("ring_idx", IntegerType(), False),
        StructField("lats", ArrayType(DoubleType(), False), False),
        StructField("lons", ArrayType(DoubleType(), False), False),
    ]
)

# admin / landuse polygons (right side of the PIP join)
POLYGONS = StructType(
    [
        StructField("poly_id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("ring_lats", ArrayType(DoubleType(), False), False),
        StructField("ring_lons", ArrayType(DoubleType(), False), False),
    ]
)

# reference output row (textoutputhelper.cpp:94-99) + engine rank
LABELS = StructType(
    [
        StructField("lat", DoubleType(), False),
        StructField("lon", DoubleType(), False),
        StructField("level_id", LongType(), False),
        StructField("radius", DoubleType(), False),
        StructField("osm_id", LongType(), False),
        StructField("label", StringType(), False),
        StructField("factor", DoubleType(), False),
    ]
)

LEVELS = StructType(
    [
        StructField("level_id", LongType(), False),
        StructField("level_name", StringType(), False),
        StructField("factor", IntegerType(), False),
        StructField("icon", StringType(), False),
    ]
)
