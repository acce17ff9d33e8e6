from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.cdc import apply_changelog


def _state(rows):
    return {r.id: (r.val, r.tag) for r in rows}


def test_apply_changelog_semantics(spark):
    snap = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, 40.0, "d")],
        "id long, val double, tag string",
    )
    chg = spark.createDataFrame(
        [
            # key 1: update then delete -> absent
            (1, 11.0, "a1", 5, "U"),
            (1, None, None, 9, "D"),
            # key 2: delete then re-insert -> latest wins
            (2, None, None, 3, "D"),
            (2, 22.0, "b2", 7, "U"),
            # key 3: two updates -> highest seq wins
            (3, 31.0, "c1", 2, "U"),
            (3, 33.0, "c3", 8, "U"),
            # key 5: brand-new key inserted by the changelog
            (5, 55.0, "e", 1, "U"),
        ],
        "id long, val double, tag string, seq long, op string",
    )
    got = _state(apply_changelog(snap, chg, key="id").collect())
    assert got == {
        2: (22.0, "b2"),
        3: (33.0, "c3"),
        4: (40.0, "d"),  # untouched snapshot row survives
        5: (55.0, "e"),
    }


def test_apply_changelog_partitioning_invariant(spark):
    snap = spark.range(0, 200).select(
        F.col("id"), (F.col("id") * 1.5).alias("val"), F.lit("s").alias("tag")
    )
    chg = spark.range(0, 500).select(
        (F.col("id") % 130).alias("id"),
        (F.col("id") * 2.0).alias("val"),
        F.lit("c").alias("tag"),
        F.col("id").alias("seq"),
        F.when(F.col("id") % 7 == 0, "D").otherwise("U").alias("op"),
    )
    a = _state(apply_changelog(snap, chg).collect())
    b = _state(apply_changelog(snap.repartition(13), chg.repartition(3)).collect())
    assert a == b and len(a) > 100


def test_apply_changelog_bad_op_raises(spark):
    snap = spark.createDataFrame([(1, 1.0, "x")], "id long, val double, tag string")
    chg = spark.createDataFrame([(1, 2.0, "y", 1, "X")], "id long, val double, tag string, seq long, op string")
    with pytest.raises(Exception, match="unknown op"):
        apply_changelog(snap, chg).collect()


def test_apply_changelog_missing_payload_col_raises(spark):
    snap = spark.createDataFrame([(1, 1.0)], "id long, val double")
    chg = spark.createDataFrame([(1, 1, "U")], "id long, seq long, op string")
    with pytest.raises(ValueError, match="lacks snapshot columns"):
        apply_changelog(snap, chg)


def test_scd2_intervals_semantics(spark):
    from osmgraft.operators.cdc import scd2_intervals

    chg = spark.createDataFrame(
        [
            # key 1: v1, no-op replay (merges), v2, delete, re-insert v3
            (1, 1, "U", "a"),
            (1, 2, "U", "a"),
            (1, 3, "U", "b"),
            (1, 5, "D", None),
            (1, 8, "U", "c"),
            # key 2: single version, still open
            (2, 4, "U", "x"),
        ],
        "id long, seq long, op string, tag string",
    )
    rows = sorted(
        (r.id, r.tag, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_intervals(chg, key="id", attrs=["tag"]).collect()
    )
    assert rows == [
        (1, "a", 1, 3, False),   # replay at seq 2 minted no version
        (1, "b", 3, 5, False),   # closed by the delete
        (1, "c", 8, None, True),
        (2, "x", 4, None, True),
    ]


def test_scd2_intervals_consecutive_deletes_merge(spark):
    from osmgraft.operators.cdc import scd2_intervals

    chg = spark.createDataFrame(
        [(7, 1, "U", "v"), (7, 2, "D", None), (7, 3, "D", None), (7, 4, "U", "v")],
        "id long, seq long, op string, tag string",
    )
    rows = sorted(
        (r.valid_from, r.valid_to, r.is_current)
        for r in scd2_intervals(chg, key="id", attrs=["tag"]).collect()
    )
    # the two D rows collapse; the second U reopens at seq 4
    assert rows == [(1, 2, False), (4, None, True)]


def test_scd2_intervals_unknown_op_raises(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from osmgraft.operators.cdc import scd2_intervals

    chg = spark.createDataFrame([(1, 1, "X", "a")], "id long, seq long, op string, tag string")
    with pytest.raises(SparkRuntimeException, match="unknown op"):
        scd2_intervals(chg, key="id", attrs=["tag"]).collect()


def test_scd2_interval_laws_on_random_changelog(spark):
    """Property check on a seeded random changelog: per key the emitted
    intervals are disjoint, ordered, half-open-consistent, and exactly
    one is open iff the key's latest state is a U."""
    import random

    from osmgraft.operators.cdc import scd2_intervals

    rng = random.Random(17)
    rows = []
    latest = {}
    for seq in range(1, 400):
        k = rng.randrange(12)
        op = "D" if rng.random() < 0.2 else "U"
        tag = rng.choice(["a", "b", "c"]) if op == "U" else None
        rows.append((k, seq, op, tag))
        latest[k] = op
    chg = spark.createDataFrame(rows, "id long, seq long, op string, tag string")
    out = scd2_intervals(chg, key="id", attrs=["tag"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["id"], []).append(r)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r["valid_from"])
        opens = [r for r in ivs if r["valid_to"] is None]
        # exactly one open interval iff latest op is U
        assert len(opens) == (1 if latest[k] == "U" else 0), k
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] is not None and a["valid_to"] <= b["valid_from"], k
        for r in ivs:
            assert r["is_current"] == (r["valid_to"] is None)
            if r["valid_to"] is not None:
                assert r["valid_from"] < r["valid_to"]
