"""Distributed DBSCAN (operators/cluster.py): textbook role assignment,
min-label determinism, and exact agreement with a sequential brute-force
reference on a seeded random instance."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.cluster import dbscan


def _pts_df(spark, rows):
    return spark.createDataFrame(rows, "pid long, lat double, lon double")


def _collect(df):
    return {r["pid"]: (r["cluster"], r["role"]) for r in df.collect()}


def test_textbook_roles(spark):
    # 5x5 dense blob (111 m spacing), a 3-chain too sparse to be core,
    # one isolated point
    rows = [(i, (i % 5) * 0.001, (i // 5) * 0.001) for i in range(25)]
    rows += [(100 + i, 5.0 + i * 0.001, 5.0) for i in range(3)]
    rows += [(200, 9.0, 9.0)]
    got = _collect(dbscan(_pts_df(spark, rows), eps_m=200.0, min_pts=4))
    for i in range(25):
        assert got[i] == (0, "core")  # min id of the blob
    for p in (100, 101, 102, 200):
        assert got[p] == (None, "noise")


def test_border_points(spark):
    # 4 mutually-close cores + one point within eps of exactly one core
    rows = [(i, i * 0.0005, 0.0) for i in range(4)]
    rows.append((10, 4 * 0.0005 + 0.0008, 0.0))  # ~90m past pid 3 only
    got = _collect(dbscan(_pts_df(spark, rows), eps_m=200.0, min_pts=4))
    assert got[10] == (0, "border")
    assert all(got[i] == (0, "core") for i in range(4))


def test_two_clusters_min_label(spark):
    rows = [(i, i * 0.0005, 0.0) for i in range(4)]
    rows += [(50 + i, 3.0 + i * 0.0005, 3.0) for i in range(4)]
    got = _collect(dbscan(_pts_df(spark, rows), eps_m=200.0, min_pts=3))
    assert {got[i][0] for i in range(4)} == {0}
    assert {got[50 + i][0] for i in range(4)} == {50}


def test_singleton_core_min_pts_1(spark):
    rows = [(7, 1.0, 1.0), (9, 2.0, 2.0)]
    got = _collect(dbscan(_pts_df(spark, rows), eps_m=100.0, min_pts=1))
    assert got[7] == (7, "core") and got[9] == (9, "core")


def _hav_m(a, b):
    R = 6371008.8
    p1, p2 = math.radians(a[0]), math.radians(b[0])
    x = (
        math.sin(math.radians(b[0] - a[0]) / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(math.radians(b[1] - a[1]) / 2) ** 2
    )
    return 2 * R * math.asin(math.sqrt(x))


def _ref_dbscan(pts, eps_m, min_pts):
    """Sequential reference of the deterministic min-label formulation."""
    ids = sorted(pts)
    nb = {i: [j for j in ids if j != i and _hav_m(pts[i], pts[j]) <= eps_m] for i in ids}
    core = {i for i in ids if len(nb[i]) + 1 >= min_pts}
    # components of the core-core graph, labeled by min id
    label = {}
    for i in sorted(core):
        if i in label:
            continue
        stack, comp = [i], []
        seen = {i}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in nb[x]:
                if y in core and y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            label[x] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = (label[i], "core")
        else:
            cs = [label[j] for j in nb[i] if j in core]
            out[i] = (min(cs), "border") if cs else (None, "noise")
    return out


@pytest.mark.parametrize("min_pts", [3, 5])
def test_matches_bruteforce_reference(spark, min_pts):
    rng = random.Random(4242)
    pts = {}
    pid = 0
    for cx, cy, n, spread in [(0.0, 0.0, 40, 0.004), (0.05, 0.02, 30, 0.003), (-3.0, 1.0, 8, 0.02)]:
        for _ in range(n):
            pts[pid] = (cx + rng.uniform(-spread, spread), cy + rng.uniform(-spread, spread))
            pid += 1
    for _ in range(15):  # scattered noise
        pts[pid] = (rng.uniform(-5, 5), rng.uniform(-5, 5))
        pid += 1
    df = _pts_df(spark, [(i, la, lo) for i, (la, lo) in pts.items()]).repartition(6)
    got = _collect(dbscan(df, eps_m=400.0, min_pts=min_pts))
    assert got == _ref_dbscan(pts, 400.0, min_pts)
