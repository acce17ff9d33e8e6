"""As-of join: semantics vs a bisect reference, parity vs DuckDB ASOF JOIN."""

from __future__ import annotations

import bisect
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.temporal import asof_join, asof_oracle_sql

T0 = datetime(2024, 1, 1)


def _t(s):
    return T0 + timedelta(seconds=s)


def _frames(spark):
    # left: 3 keys x irregular event times; right: sparse snapshots,
    # unique (key, ts) per the documented precondition
    left_rows = [
        (k, _t(s), f"e{k}-{s}")
        for k in (1, 2, 3)
        for s in (0, 5, 9, 10, 17, 30, 31, 55)
    ]
    right_rows = [
        (1, _t(2), 10.0),
        (1, _t(10), 11.0),
        (1, _t(31), 12.0),
        (2, _t(0), 20.0),
        (2, _t(54), 21.0),
        # key 3 has no snapshots at all
    ]
    left = spark.createDataFrame(left_rows, "k int, ts timestamp, eid string")
    right = spark.createDataFrame(right_rows, "k int, ts timestamp, snap double")
    return left, right, left_rows, right_rows


def _expect_backward(left_rows, right_rows, tolerance_s=None):
    by_key = {}
    for k, ts, v in right_rows:
        by_key.setdefault(k, []).append((ts, v))
    for k in by_key:
        by_key[k].sort()
    out = {}
    for k, ts, eid in left_rows:
        snaps = by_key.get(k, [])
        i = bisect.bisect_right([s[0] for s in snaps], ts) - 1
        match = snaps[i] if i >= 0 else None
        if match and tolerance_s is not None and (ts - match[0]).total_seconds() > tolerance_s:
            match = None
        out[eid] = (match[0] if match else None, match[1] if match else None)
    return out


def test_asof_backward_matches_bisect_reference(spark):
    left, right, lrows, rrows = _frames(spark)
    got = {
        r["eid"]: (r["ts_right"], r["snap_right"])
        for r in asof_join(left, right, key="k").collect()
    }
    assert got == _expect_backward(lrows, rrows)
    # tie at equal timestamps matches (left ts == right ts)
    assert got["e1-10"] == (_t(10), 11.0)
    # key 3 has no snapshots -> left rows survive with nulls (how='left')
    assert got["e3-30"] == (None, None)


def test_asof_backward_parity_vs_duckdb_native_asof(spark):
    duckdb = pytest.importorskip("duckdb")
    left, right, lrows, rrows = _frames(spark)
    got = sorted(
        (r["k"], r["ts"], r["eid"], r["ts_right"], r["snap_right"])
        for r in asof_join(left, right, key="k").collect()
    )
    con = duckdb.connect()
    con.execute("create table l(k int, ts timestamp, eid varchar)")
    con.executemany("insert into l values (?,?,?)", lrows)
    con.execute("create table r(k int, ts timestamp, snap double)")
    con.executemany("insert into r values (?,?,?)", rrows)
    sql = asof_oracle_sql(
        "select * from l",
        "select * from r",
        key="k",
        left_cols=["k", "ts", "eid"],
        right_payload=["ts", "snap"],
    )
    assert got == sorted(tuple(row) for row in con.execute(sql).fetchall())


def test_asof_forward_and_tolerance(spark):
    left, right, lrows, rrows = _frames(spark)
    fwd = {
        r["eid"]: (r["ts_right"], r["snap_right"])
        for r in asof_join(left, right, key="k", direction="forward").collect()
    }
    # earliest snapshot at-or-after: e1-5 -> t=10; e1-31 ties exactly
    assert fwd["e1-5"] == (_t(10), 11.0)
    assert fwd["e1-31"] == (_t(31), 12.0)
    assert fwd["e1-55"] == (None, None)  # nothing after t=31 for key 1

    tol = {
        r["eid"]: r["snap_right"]
        for r in asof_join(left, right, key="k", tolerance_s=3.0).collect()
    }
    assert tol["e1-5"] == 10.0  # 3s gap, within tolerance
    assert tol["e1-9"] is None  # 7s gap, dropped
    assert tol["e1-10"] == 11.0  # exact hit


def test_asof_inner_drops_unmatched(spark):
    left, right, _, _ = _frames(spark)
    inner = asof_join(left, right, key="k", how="inner")
    ks = {r["k"] for r in inner.collect()}
    assert 3 not in ks  # key without snapshots fully dropped
    # left rows before any snapshot are dropped too
    eids = {r["eid"] for r in inner.collect()}
    assert "e1-0" not in eids and "e2-0" in eids


def test_asof_forward_tolerance_parity_vs_duckdb_lateral(spark):
    duckdb = pytest.importorskip("duckdb")
    left, right, lrows, rrows = _frames(spark)
    got = sorted(
        (r["k"], r["eid"], r["ts_right"], r["snap_right"])
        for r in asof_join(
            left, right, key="k", direction="forward", tolerance_s=5.0
        ).collect()
    )
    con = duckdb.connect()
    con.execute("create table l(k int, ts timestamp, eid varchar)")
    con.executemany("insert into l values (?,?,?)", lrows)
    con.execute("create table r(k int, ts timestamp, snap double)")
    con.executemany("insert into r values (?,?,?)", rrows)
    sql = asof_oracle_sql(
        "select * from l",
        "select * from r",
        key="k",
        left_cols=["k", "eid"],
        right_payload=["ts", "snap"],
        direction="forward",
        tolerance_s=5.0,
    )
    assert got == sorted(tuple(row) for row in con.execute(sql).fetchall())


def test_asof_single_shuffle_no_join_node(spark):
    left, right, _, _ = _frames(spark)
    out = asof_join(left, right, key="k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"hashpartitioning\(_k", plan)) >= 1
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan


def test_asof_validation(spark):
    left, right, _, _ = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, key="k", direction="nearest")
    with pytest.raises(ValueError):
        asof_join(left, right, key="missing")
    with pytest.raises(ValueError):
        asof_join(left, right, key="k", tolerance_s=-1.0)
    with pytest.raises(ValueError):
        asof_join(left, right, key="k", how="outer")


# ---------------------------------------------------------------------------
# interval join
# ---------------------------------------------------------------------------


def _iv_frames(spark):
    import random

    rng = random.Random(7)
    pts = [(i, float(rng.randint(0, 100_000)), i % 5) for i in range(800)]
    ivs = []
    for j in range(120):
        s = float(rng.randint(0, 99_000))
        ivs.append((j, s, s + rng.randint(0, 3000), j % 5))
    # two LONG intervals (span >> max_span_buckets at bucket_s=600)
    ivs.append((900, 1000.0, 95_000.0, 1))
    ivs.append((901, 0.0, 100_000.0, 2))
    p = spark.createDataFrame(pts, "pid long, ts double, k int")
    iv = spark.createDataFrame(ivs, "iv_id long, start_ts double, end_ts double, k int")
    return p, iv, pts, ivs


def _brute_pairs(pts, ivs, keyed):
    return {
        (p[0], v[0])
        for p in pts
        for v in ivs
        if v[1] <= p[1] <= v[2] and (not keyed or p[2] == v[3])
    }


def test_interval_join_matches_bruteforce(spark):
    from osmgraft.operators.temporal import interval_join

    p, iv, pts, ivs = _iv_frames(spark)
    got = [
        (r["pid"], r["iv_id_iv"])
        for r in interval_join(p, iv, bucket_s=600.0, max_span_buckets=8).collect()
    ]
    assert len(got) == len(set(got))  # no duplicate pairs from the explode
    assert set(got) == _brute_pairs(pts, ivs, keyed=False)


def test_interval_join_keyed(spark):
    from osmgraft.operators.temporal import interval_join

    p, iv, pts, ivs = _iv_frames(spark)
    got = {
        (r["pid"], r["iv_id_iv"])
        for r in interval_join(
            p, iv, key="k", bucket_s=600.0, max_span_buckets=8
        ).collect()
    }
    assert got == _brute_pairs(pts, ivs, keyed=True)
    assert got  # non-trivial


def test_interval_join_long_rail_is_broadcast_only(spark):
    """Short intervals must join via an equi-join on the bucket; the only
    nested-loop allowed is the broadcast long-interval rail."""
    import re

    from osmgraft.operators.temporal import interval_join

    p, iv, _, _ = _iv_frames(spark)
    out = interval_join(p, iv, bucket_s=600.0, max_span_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"BroadcastNestedLoopJoin", plan)) <= 1
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


def test_interval_join_validation_and_empty_edges(spark):
    from osmgraft.operators.temporal import interval_join

    p, iv, _, _ = _iv_frames(spark)
    with pytest.raises(ValueError):
        interval_join(p, iv, bucket_s=0.0)
    with pytest.raises(ValueError):
        interval_join(p, iv, max_span_buckets=0)
    with pytest.raises(ValueError):
        interval_join(p, iv, key="missing")
    # inverted intervals are dropped, not matched
    bad = spark.createDataFrame(
        [(1, 50.0, 10.0, 0)], "iv_id long, start_ts double, end_ts double, k int"
    )
    assert interval_join(p, bad).count() == 0
