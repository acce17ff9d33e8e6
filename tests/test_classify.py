"""C1/P6 classification semantics, pinned against the reference tree walk
(/root/reference/src/mapping/mappinghelper.cpp:377-454) via BOTH the
pure-Python oracle and the compiled Catalyst expression."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import MapType, StringType, StructField, StructType

from osmgraft.functions.classify import level_expr, levels_rows, py_filter, py_level
from osmgraft.sources.config import default_config

CFG = default_config()
LEVEL_BY_NAME = {name: lid for lid, name, _, _ in levels_rows(CFG)}


def spark_level(spark, tags: dict[str, str]) -> int:
    schema = StructType([StructField("tags", MapType(StringType(), StringType()))])
    df = spark.createDataFrame([(tags,)], schema=schema)
    return df.select(level_expr(CFG, F.col("tags")).alias("lid")).collect()[0]["lid"]


# the two hard-coded smoke cases from MappingHelper::test()
# (mappinghelper.cpp:484-497)
CASES = [
    # unknown amenity -> undefined level
    ({"name": "P1", "amenity": "shit", "bla": "blub"}, 0),
    # place=city, population=5000000 -> MEGA_CITY ('greater' is >=, :392-394)
    ({"name": "P2", "place": "city", "population": "5000000", "bla": "blub"}, "MEGA_CITY"),
    # population bands, first-match priority in document order
    ({"place": "city", "population": "4999999"}, "LARGE_CITY"),
    ({"place": "city", "population": "1000000"}, "LARGE_CITY"),
    ({"place": "city", "population": "999999"}, "CITY"),
    ({"place": "city", "population": "500000"}, "CITY"),
    ({"place": "city", "population": "499999"}, "SMALL_CITY"),
    ({"place": "city"}, "SMALL_CITY"),  # no population -> constraint false -> default leaf
    ({"place": "town", "population": "100000"}, "LARGE_TOWN"),
    ({"place": "town", "population": "25000"}, "TOWN"),
    ({"place": "town"}, "SMALL_TOWN"),
    ({"place": "village"}, "VILLAGE"),
    ({"place": "hamlet"}, "HAMLET"),
    ({"place": "spaceport"}, 0),  # place exists but no leaf matches
    # atoi semantics: non-numeric population -> 0 -> no GREATER band matches
    ({"place": "city", "population": "many"}, "SMALL_CITY"),
    ({"place": "city", "population": "  +1000001people"}, "LARGE_CITY"),
    ({"place": "city", "population": "-5"}, "SMALL_CITY"),
    # OR semantics within a leaf's constraint list
    ({"amenity": "school"}, "SCHOOL"),
    ({"amenity": "language_school"}, "SCHOOL"),
    ({"amenity": "education"}, "SCHOOL"),
    ({"amenity": "university"}, "UNIVERSITY"),
    # SETTLEMENT subtree wins over AMENITY (document order priority);
    # population missing -> GREATER bands false -> default SMALL_CITY leaf
    ({"place": "city", "amenity": "library"}, "SMALL_CITY"),
    # LESS constraint via capacity
    ({"amenity": "bench", "capacity": "50"}, "SMALL_VENUE"),
    ({"amenity": "bench", "capacity": "100"}, 0),
    ({"amenity": "bench"}, 0),  # missing tag -> LESS false
    # missing tags entirely
    ({}, 0),
]


@pytest.mark.parametrize("tags,expected", CASES)
def test_py_oracle(tags, expected):
    exp = LEVEL_BY_NAME[expected] if isinstance(expected, str) else expected
    assert py_level(CFG, tags) == exp


def test_spark_matches_oracle(spark):
    all_tags = [t for t, _ in CASES] + [
        {"place": "city", "amenity": "library"},
        {"place": "suburb", "population": "0"},
        {"capacity": "99"},
    ]
    schema = StructType([StructField("tags", MapType(StringType(), StringType()))])
    df = spark.createDataFrame([(t,) for t in all_tags], schema=schema)
    got = [r["lid"] for r in df.select(level_expr(CFG, F.col("tags")).alias("lid")).collect()]
    want = [py_level(CFG, t) for t in all_tags]
    assert got == want


def test_level_id_assignment_reverse_dfs():
    """Leaf ids replicate the reference's reversed construction order
    (mappinghelper.cpp:219-233): LAST leaf in document order gets id 1."""
    leaves = CFG.leaves()
    names = [lf.name for lf in leaves]
    ids = [lf.level_id for lf in leaves]
    # document order for the default config
    assert names == [
        "MEGA_CITY", "LARGE_CITY", "CITY", "SMALL_CITY",
        "LARGE_TOWN", "TOWN", "SMALL_TOWN",
        "VILLAGE", "SUBURB", "HAMLET",
        "SCHOOL", "UNIVERSITY", "LIBRARY", "HOSPITAL", "CAFE", "SMALL_VENUE",
    ]
    n = len(names)
    assert ids == list(range(n, 0, -1))


def test_filter_tree():
    f = CFG.filter_tree
    assert py_filter(f, {"place": "city", "name": "X"})
    assert py_filter(f, {"amenity": "bench"})
    assert not py_filter(f, {"place": "city"})  # place without name, no amenity
    assert not py_filter(f, {"name": "X"})
    assert not py_filter(f, {})


def test_filter_spark_matches(spark):
    from osmgraft.functions.classify import filter_expr

    cases = [
        {"place": "city", "name": "X"},
        {"amenity": "bench"},
        {"place": "city"},
        {"name": "X"},
        {},
    ]
    schema = StructType([StructField("tags", MapType(StringType(), StringType()))])
    df = spark.createDataFrame([(t,) for t in cases], schema=schema)
    got = [r["ok"] for r in df.select(filter_expr(CFG.filter_tree, F.col("tags")).alias("ok")).collect()]
    assert got == [py_filter(CFG.filter_tree, t) for t in cases]


def test_import_name_literal_order_dependence(spark):
    # Reference get_name bug (osminputhelper.cpp:504): official_name sets
    # the running max to name's level, so official_name-before-name
    # suppresses the later name; name-first short-circuits.
    from osmgraft.functions.names import import_name_literal_expr

    cases = [
        ([("official_name", "Off"), ("name", "N")], "Off"),   # the bug
        ([("name", "N"), ("official_name", "Off")], "N"),     # break on name
        ([("int_name", "I"), ("official_name", "Off")], "Off"),
        ([("official_name", "Off"), ("int_name", "I")], "Off"),
        ([("name:en", "E"), ("int_name", "I")], "I"),
        ([("amenity", "bench")], ""),
        ([], ""),
    ]
    schema = "entries array<struct<key:string,value:string>>"
    df = spark.createDataFrame([([{"key": k, "value": v} for k, v in e],) for e, _ in cases], schema)
    got = [r["n"] for r in df.select(import_name_literal_expr(F.col("entries")).alias("n")).collect()]
    assert got == [w for _, w in cases]


def test_label_name_literal_inverted_dominance(spark):
    # Reference getName (osmpoi.cpp:246-274): Dom guards are inverted, so
    # the effective priority is name:en > name:de > name.
    from osmgraft.functions.names import label_name_literal_expr

    cases = [
        ({"name": "N", "name:en": "E"}, "E"),
        ({"name": "N", "name:de": "D"}, "D"),
        ({"name": "N", "name:de": "D", "name:en": "E"}, "E"),
        ({"name": "N"}, "N"),
        ({}, "<undefined>"),
    ]
    schema = StructType([StructField("tags", MapType(StringType(), StringType()))])
    df = spark.createDataFrame([(t,) for t, _ in cases], schema=schema)
    got = [r["n"] for r in df.select(label_name_literal_expr(F.col("tags")).alias("n")).collect()]
    assert got == [w for _, w in cases]


def test_literal_names_end_to_end(spark):
    # Span order survives decode into _name_lit: an official_name span
    # BEFORE a name span wins in literal mode, loses in default mode.
    import pyspark.sql.functions as SF

    from osmgraft.sources.decode import decode_documents
    from osmgraft.sources.geoblob import pack_point

    blobs = spark.createDataFrame([("b1", bytearray(pack_point(10.0, 20.0)))], "blob_id string, payload binary")
    spans = [
        {"kind": "tag", "text": "official_name=Official", "media_ref": None, "offset": 0},
        {"kind": "tag", "text": "place=city", "media_ref": None, "offset": 1},
        {"kind": "tag", "text": "name=Plain", "media_ref": None, "offset": 2},
        {"kind": "geom", "text": None, "media_ref": "geom://b1", "offset": 3},
    ]
    docs = spark.createDataFrame(
        [("node/1", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    lit = decode_documents(docs, blobs, literal_names=True).node_pois.collect()[0]
    assert lit["_name_lit"] == "Official"
    default = decode_documents(docs, blobs).node_pois.collect()[0]
    assert "_name_lit" not in default.asDict()
    assert default["tags"]["name"] == "Plain"
